"""Build the native wav loader: python -m jukebox_tpu.csrc.build_wavio"""

import os
import subprocess
import sys


def build():
    here = os.path.dirname(__file__)
    src = os.path.join(here, "wavio.cpp")
    out = os.path.join(here, "_wavio.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, src]
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    print(build())
