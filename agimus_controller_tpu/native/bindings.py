"""ctypes bindings for the native C++ components (built on demand)."""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

from ..models.model import ModelParams, RobotModel

_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SOURCES = ["rbd_kernels.cpp", "ring_buffer.cpp", "fddp_oracle.cpp"]
_lib: Optional[ctypes.CDLL] = None


def build_native_library(force: bool = False) -> Path:
    """Compile the native sources into a cached .so (g++ -O2)."""
    srcs = [_SRC_DIR / s for s in _SOURCES]
    digest = hashlib.sha256(
        b"".join(p.read_bytes() for p in srcs)
    ).hexdigest()[:16]
    out = Path(tempfile.gettempdir()) / f"agimus_tpu_native_{digest}.so"
    if out.exists() and not force:
        return out
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        *[str(s) for s in srcs], "-o", str(out),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(build_native_library()))
        c_dp = ctypes.POINTER(ctypes.c_double)
        c_ip = ctypes.POINTER(ctypes.c_int)
        model_sig = [ctypes.c_int, c_ip, c_ip] + [c_dp] * 7
        _lib.rnea.argtypes = model_sig + [c_dp] * 4
        _lib.crba.argtypes = model_sig + [c_dp] * 2
        _lib.forward_dynamics.argtypes = model_sig + [c_dp] * 5
        _lib.rb_create.restype = ctypes.c_void_p
        _lib.rb_create.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
        _lib.rb_destroy.argtypes = [ctypes.c_void_p]
        _lib.rb_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib.rb_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib.rb_latest.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib.rb_size.restype = ctypes.c_uint64
        _lib.rb_size.argtypes = [ctypes.c_void_p]
        _lib.fddp_oracle_solve.restype = ctypes.c_int
        _lib.fddp_oracle_solve.argtypes = (
            model_sig + [c_dp]  # armature
            + [ctypes.c_int] + [ctypes.c_double] * 4  # T, dt, weights
            + [c_dp, ctypes.c_int, c_dp, c_dp, c_dp, c_dp]  # xref, frame
            + [c_dp, ctypes.c_int, ctypes.c_double]  # x0, max_iters, tol
            + [c_dp, c_dp, c_dp, ctypes.POINTER(ctypes.c_int)]
        )
    return _lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeRBD:
    """Native rigid-body kernels over a compiled model (the cross-language
    validation oracle; kinematic TREES — branched topologies supported via
    the parent arrays, topologically ordered; nj <= 64)."""

    def __init__(self, model: RobotModel, params: ModelParams):
        assert model.nj <= 64
        self._lib = _load()
        self.nj = model.nj
        self._parent = np.asarray(model.parents, dtype=np.int32)
        self._jtype = np.asarray(
            [0 if t == "revolute" else 1 for t in model.joint_types], dtype=np.int32)
        f = lambda x: np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        self._joint_rot = f(params.joint_rot).reshape(-1)
        self._joint_trans = f(params.joint_trans).reshape(-1)
        self._axis = f(params.axis).reshape(-1)
        self._mass = f(params.mass)
        self._com = f(params.com).reshape(-1)
        self._inertia = f(params.inertia).reshape(-1)
        self._gravity = f(params.gravity)
        self._armature = f(params.armature)

    def _margs(self):
        ip = ctypes.POINTER(ctypes.c_int)
        return [
            self.nj,
            self._parent.ctypes.data_as(ip),
            self._jtype.ctypes.data_as(ip),
            _dp(self._joint_rot), _dp(self._joint_trans), _dp(self._axis),
            _dp(self._mass), _dp(self._com), _dp(self._inertia),
            _dp(self._gravity),
        ]

    def rnea(self, q, v, a) -> np.ndarray:
        q, v, a = [np.ascontiguousarray(x, dtype=np.float64) for x in (q, v, a)]
        tau = np.zeros(self.nj)
        self._lib.rnea(*self._margs(), _dp(q), _dp(v), _dp(a), _dp(tau))
        return tau

    def crba(self, q) -> np.ndarray:
        q = np.ascontiguousarray(q, dtype=np.float64)
        M = np.zeros((self.nj, self.nj))
        self._lib.crba(*self._margs(), _dp(q), _dp(M.reshape(-1)))
        return M

    def forward_dynamics(self, q, v, tau) -> np.ndarray:
        q, v, tau = [np.ascontiguousarray(x, dtype=np.float64) for x in (q, v, tau)]
        a = np.zeros(self.nj)
        self._lib.forward_dynamics(
            *self._margs(), _dp(self._armature), _dp(q), _dp(v), _dp(tau), _dp(a))
        return a


class NativeFDDP(NativeRBD):
    """Independent C++ iLQR/FDDP on the goal-reaching OCP — the
    cross-language full-solve oracle (BASELINE.md accuracy target: u-error
    < 1e-4 vs an independent FDDP on the same horizon; Crocoddyl is not
    installable here, `native/fddp_oracle.cpp` is the stand-in)."""

    def solve(self, *, T: int, dt: float, w_state: float, w_ctrl: float,
              w_goal: float, xref: np.ndarray, frame_joint: int,
              frame_rot: np.ndarray, frame_trans: np.ndarray,
              goal_rot: np.ndarray, goal_trans: np.ndarray, x0: np.ndarray,
              max_iters: int = 200, tol: float = 1e-9):
        nx, nu = 2 * self.nj, self.nj
        # the C side uses static workspaces hard-sized for these bounds
        # (and also rejects with rc=-2); validate early with a clear error
        if not (1 <= T <= 4096):
            raise ValueError(f"oracle supports 1 <= T <= 4096, got {T}")
        if self.nj > 16:
            raise ValueError(f"oracle supports nj <= 16, got {self.nj}")
        c = lambda a: np.ascontiguousarray(a, dtype=np.float64).reshape(-1)
        xs = np.zeros((T + 1) * nx)
        us = np.zeros(T * nu)
        kkt = ctypes.c_double()
        iters = ctypes.c_int()
        rc = self._lib.fddp_oracle_solve(
            *self._margs(), _dp(self._armature),
            T, dt, w_state, w_ctrl, w_goal,
            _dp(c(xref)), int(frame_joint), _dp(c(frame_rot)),
            _dp(c(frame_trans)), _dp(c(goal_rot)), _dp(c(goal_trans)),
            _dp(c(x0)), max_iters, tol,
            _dp(xs), _dp(us), ctypes.byref(kkt), ctypes.byref(iters))
        return (rc, xs.reshape(T + 1, nx), us.reshape(T, nu),
                float(kkt.value), int(iters.value))


class RingBuffer:
    """SPSC lock-free ring buffer of fixed-size float64 records (native)."""

    def __init__(self, capacity_pow2: int, record_floats: int):
        self._lib = _load()
        self._record_floats = record_floats
        self._h = self._lib.rb_create(capacity_pow2, record_floats * 8)
        if not self._h:
            raise ValueError("capacity must be a power of two")

    def push(self, record: np.ndarray) -> bool:
        r = np.ascontiguousarray(record, dtype=np.float64)
        assert r.size == self._record_floats
        return bool(self._lib.rb_push(self._h, r.ctypes.data))

    def pop(self) -> Optional[np.ndarray]:
        out = np.empty(self._record_floats)
        if self._lib.rb_pop(self._h, out.ctypes.data):
            return out
        return None

    def latest(self) -> Optional[np.ndarray]:
        out = np.empty(self._record_floats)
        if self._lib.rb_latest(self._h, out.ctypes.data):
            return out
        return None

    def __len__(self):
        return int(self._lib.rb_size(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rb_destroy(self._h)
            self._h = None
