"""Argoverse v1.1 tracking download (reference parity: download/argo.py)."""

from __future__ import annotations

from .utils import download_url, unzip

SPLIT_LIST = ["train1", "train2", "train3", "train4", "val", "test"]


def get_download_link(split: str) -> str:
    # https://www.argoverse.org/data.html#download-link
    return f"https://s3.amazonaws.com/argoai-argoverse/tracking_{split}_v1.1.tar.gz"


def download_argo(dst: str, delete_zips: bool = True) -> None:
    for split in SPLIT_LIST:
        local = download_url(get_download_link(split), dst)
        unzip(local, delete_zips=delete_zips)
    print(f"Argoverse dataset has been downloaded to {dst}")
