"""Build the native compressed-audio loader:
python -m jukebox_tpu.csrc.build_avio

Links against the system ffmpeg libraries (libavformat/libavcodec/
libavutil/libswresample) — present as shared libs in this image even
though the ffmpeg CLI is not."""

import ctypes.util
import os
import subprocess


def available():
    return all(
        ctypes.util.find_library(n)
        for n in ("avformat", "avcodec", "avutil", "swresample"))


def build():
    here = os.path.dirname(__file__)
    src = os.path.join(here, "avio.cpp")
    out = os.path.join(here, "_avio.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", out, src,
           "-lavformat", "-lavcodec", "-lavutil", "-lswresample"]
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    print(build())
