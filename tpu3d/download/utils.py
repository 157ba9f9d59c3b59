"""Download primitives: parallel HTTP (axel/wget), gdrive, gcloud, unzip.

Reference parity: download/utils.py — resume by file-exists check, axel with
one connection per CPU when available, gdrive auto-install for split files,
gcloud SDK auto-install + license note for Waymo.
"""

from __future__ import annotations

import multiprocessing
import os
import subprocess
from shutil import which


def run(cmd: str) -> str:
    print(f">>> {cmd}")
    return subprocess.run(cmd, shell=True, capture_output=True,
                          text=True).stdout


def is_tool(name: str) -> bool:
    return which(name) is not None


def download_url(src: str, dst: str) -> str:
    """Fetch src to dst (file or dir); skips when the file already exists."""
    if "." in os.path.basename(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
    else:
        os.makedirs(dst, exist_ok=True)
        dst = os.path.join(dst, os.path.basename(src))
    if os.path.isfile(dst):
        return dst
    if is_tool("axel"):
        cmd = f"axel -n {multiprocessing.cpu_count()} {src} -o {dst}"
    else:
        cmd = f"wget {src} -O {dst}"
    print(f">>> {cmd}")
    os.system(cmd)
    return dst


def download_gdrive(token: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    if is_tool("gdrive"):
        gdrive = "gdrive"
    else:
        gdrive = "/tmp/gdrive-linux-x64"
        if not os.path.isfile(gdrive):
            os.system(
                "wget https://github.com/gdrive-org/gdrive/releases/download/"
                "2.1.0/gdrive-linux-x64 -P /tmp --no-check-certificate")
        os.system(f"chmod +x {gdrive}")
    cmd = f"{gdrive} download {token} --path {dst}"
    print(f">>> {cmd}")
    os.system(cmd)


def unzip(file: str, delete_zips: bool = True) -> None:
    if file.endswith(".zip"):
        cmd = f"unzip -n {file} -d {os.path.dirname(file)}"
    elif file.endswith(".tar.gz"):
        cmd = f"tar -xzf {file} -C {os.path.dirname(file)}"
    elif file.endswith(".tar"):
        cmd = f"tar -xf {file} -C {os.path.dirname(file)}"
    else:
        raise NotImplementedError(file)
    print(f">>> {cmd}")
    os.system(cmd)
    if delete_zips:
        os.remove(file)


def download_gcloud(src: str, dst: str, note: str) -> str:
    """gsutil -m cp -r of a gs:// folder; prints the license note when the
    bucket is not accessible."""
    if "." in os.path.basename(dst):
        dst = os.path.dirname(dst)
    os.makedirs(dst, exist_ok=True)
    if is_tool("gsutil"):
        gsutil = "gsutil"
    else:
        gsutil = os.path.expanduser("~/google-cloud-sdk/bin/gsutil")
        if not os.path.isfile(gsutil):
            os.system("curl https://sdk.cloud.google.com | bash")
            os.system(os.path.expanduser("~/google-cloud-sdk/bin/gcloud")
                      + " init")
    if run(f"{gsutil} ls gs://{src}") == "":
        print(note)
    else:
        os.system(f"{gsutil} -m cp -r gs://{src} {dst}")
    return os.path.join(dst, os.path.basename(src))
