"""Remote artifact helpers (equivalent of jukebox/utils/remote_utils.py):
wget download plus gsutil up/down/ls. Used to fetch released checkpoints into
~/.cache; no-ops gracefully in zero-egress environments."""

import os
import subprocess


def download(remote_path, local_path, async_download=False):
    args = ["wget", "-O", local_path, remote_path]
    print("Running ", " ".join(args))
    if async_download:
        subprocess.Popen(args)
    else:
        subprocess.call(args)


def gs_download(gs_path, local_path, async_download=False):
    args = ["gsutil", "cp", gs_path, local_path]
    if async_download:
        subprocess.Popen(args)
    else:
        subprocess.call(args)


def gs_upload(local_path, gs_path, async_upload=False):
    assert not local_path.startswith("gs://")
    assert gs_path.startswith("gs://")
    args = ["gsutil", "cp", local_path, gs_path]
    if async_upload:
        subprocess.Popen(args)
    else:
        subprocess.call(args)


def ls(regex):
    outputs = subprocess.check_output(["gsutil", "ls", regex]).decode("utf-8")
    return [line for line in outputs.split("\n") if line]
