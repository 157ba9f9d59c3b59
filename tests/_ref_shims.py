"""Shared infrastructure for the tests that execute the reference's source.

The ``test_*_reference_diff.py`` files run /root/reference's own python on
CPU; they all need the same shims (an easydict stand-in, torch CUDA-method
patches, sys.modules bookkeeping, reproducible seeds). Keeping one copy here
prevents drift — notably, whichever test file imports the reference's
``lib.config`` first bakes its cfg tree with the easydict class active at
that moment and the module stays cached in sys.modules, so every file must
use the SAME stand-in class.
"""

from __future__ import annotations

import contextlib
import sys
import types
import zlib


def stable_seed(*key) -> int:
    """Deterministic RNG seed from any repr-able key (hash() of strings is
    salted per interpreter by PYTHONHASHSEED — failures would otherwise be
    unreproducible)."""
    return zlib.crc32(repr(key).encode()) & 0x7FFFFFFF


class EasyDictStub(dict):
    """Minimal easydict stand-in: attribute <-> key access, recursive into
    dicts and dicts inside lists/tuples (matching the real easydict)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        for k, v in {**(d or {}), **kwargs}.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, EasyDictStub):
            value = EasyDictStub(value)
        if isinstance(value, (list, tuple)):
            value = type(value)(
                EasyDictStub(x) if isinstance(x, dict) else x for x in value)
        self[name] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


@contextlib.contextmanager
def modules_swapped(**stubs):
    """Install sys.modules entries, restoring the previous state on exit
    (a value of None just records/removes the key)."""
    saved = {k: sys.modules.get(k) for k in stubs}
    for k, v in stubs.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def easydict_module() -> types.ModuleType:
    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDictStub
    return mod


@contextlib.contextmanager
def torch_cpu_shims(torch, cuda_method=True, float_tensor=False,
                    get_device=False):
    """Patch the torch CUDA touchpoints the reference's code hits on CPU:
    ``Tensor.cuda`` (identity), ``torch.cuda.FloatTensor`` (zeros factory),
    ``Tensor.get_device`` (returns 'cpu' so ``.to(get_device())`` works)."""
    saves = []
    if cuda_method:
        saves.append(("attr", torch.Tensor, "cuda", torch.Tensor.cuda))
        torch.Tensor.cuda = lambda self, *a, **kw: self
    if float_tensor:
        had = hasattr(torch.cuda, "FloatTensor")
        saves.append(("maybe", torch.cuda, "FloatTensor",
                      getattr(torch.cuda, "FloatTensor", None), had))
        torch.cuda.FloatTensor = lambda *shape: torch.zeros(*shape)
    if get_device:
        saves.append(("attr", torch.Tensor, "get_device",
                      torch.Tensor.get_device))
        torch.Tensor.get_device = lambda self: "cpu"
    try:
        yield
    finally:
        for entry in reversed(saves):
            if entry[0] == "attr":
                _, obj, name, orig = entry
                setattr(obj, name, orig)
            else:
                _, obj, name, orig, had = entry
                if had:
                    setattr(obj, name, orig)
                else:
                    delattr(obj, name)
