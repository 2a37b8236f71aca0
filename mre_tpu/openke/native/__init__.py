"""Native sampler build + ctypes binding."""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "sampler.cpp")
SO = os.path.join(_DIR, "sampler.so")


def build(force: bool = False) -> str:
    """Compile sampler.so if missing or stale (g++ is in the base image)."""
    if force or not os.path.exists(SO) or os.path.getmtime(SO) < os.path.getmtime(SRC):
        cmd = ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", SRC, "-o", SO, "-pthread"]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return SO


def load() -> ctypes.CDLL:
    lib = ctypes.cdll.LoadLibrary(build())
    lib.setInPath.argtypes = [ctypes.c_char_p]
    lib.setWorkThreads.argtypes = [ctypes.c_int64]
    lib.setBern.argtypes = [ctypes.c_int64]
    lib.setSeed.argtypes = [ctypes.c_int64]
    lib.sampling.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int64] * 4 + [ctypes.c_bool] * 3
    lib.getHeadBatch.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64]
    lib.getTailBatch.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64]
    lib.testHead.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_bool]
    lib.testTail.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_bool]
    lib.test_link_prediction.argtypes = [ctypes.c_bool]
    for name in ("getTestLinkMRR", "getTestLinkMR", "getTestLinkHit10",
                 "getTestLinkHit3", "getTestLinkHit1"):
        getattr(lib, name).argtypes = [ctypes.c_int64]
        getattr(lib, name).restype = ctypes.c_float
    for name in ("getTestLinkMRRRaw", "getTestLinkMRRaw", "getTestLinkHit10Raw"):
        getattr(lib, name).restype = ctypes.c_float
    for name in ("getEntityTotal", "getRelationTotal", "getTrainTotal",
                 "getTestTotal", "getValidTotal", "getTripleTotal"):
        getattr(lib, name).restype = ctypes.c_int64
    lib.importProb.argtypes = [ctypes.c_float]
    lib.corruptRel.argtypes = [ctypes.c_int64] * 3 + [ctypes.c_bool] * 2
    lib.corruptRel.restype = ctypes.c_int64
    lib.corruptTypeTail.argtypes = [ctypes.c_int64] * 2
    lib.corruptTypeTail.restype = ctypes.c_int64
    lib.hasProb.restype = ctypes.c_int64
    lib.hasTypes.restype = ctypes.c_int64
    return lib
