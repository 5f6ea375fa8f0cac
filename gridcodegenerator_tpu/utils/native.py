"""ctypes bindings for the native C++ oracle (``native/grid_oracle.cpp``).

The oracle is an independent float64 implementation of the algorithm family
(no shared code with the Python/JAX stack) used as a third opinion in the
test suite and as a fast host-side reference. It is compiled on demand with
the system C++ compiler and cached next to the source.
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

from ..models.robot import (RobotDescription, joint_motion_subspaces,
                            joint_xform_coefficients)

_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / "grid_oracle.cpp"
_LIB = _SRC.parent / "libgrid_oracle.so"

_D = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_I = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


@functools.lru_cache(maxsize=1)
def _load():
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True)
    lib = ctypes.CDLL(str(_LIB))
    hdr = [ctypes.c_int, _I, _I, _D, _D, _D, _D, _D, _D, _D]
    lib.grid_rnea.argtypes = hdr + [_D, _D, ctypes.c_void_p, ctypes.c_double, _D]
    lib.grid_minv.argtypes = hdr + [_D, _D]
    lib.grid_fd.argtypes = hdr + [_D, _D, _D, ctypes.c_double, _D]
    lib.grid_fd_grad.argtypes = hdr + [_D, _D, _D, ctypes.c_double, _D]
    lib.grid_fb_fd.argtypes = hdr + [_D, _D, _D, _D, _D, _D,
                                     ctypes.c_double, _D, _D]
    lib.grid_fb_step_ground.argtypes = hdr + [
        _D, _D, _D, _D, _D, _D, _D,           # I_base, quat, pos, q, vb, qd, tau
        ctypes.c_double, ctypes.c_int, _I, _D, _D,          # dt, k, links, offsets, mu
        ctypes.c_double, ctypes.c_double, ctypes.c_int,     # ground_z, gravity, iters
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # erp, margin, restitution
        _D, _D, _D, _D, _D, _D]               # quat2, pos2, q2, vb2, qd2, imp
    lib.grid_fb_stance.argtypes = hdr + [
        _D, _D, _D, _D, _D, _D, _D,           # I_base, quat, pos, q, vb, qd, tau
        ctypes.c_int, _I, _D, ctypes.c_void_p,              # k, links, offsets, anchors
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # gravity, alpha, beta
        ctypes.c_double,                                    # reg
        _D, _D, _D]                           # dvb, qdd, lam
    mdh = [ctypes.c_int, ctypes.c_int, ctypes.c_int, _I, _I, _I, _I,
           _D, _D, _D, _D, _D]
    lib.grid_md_id.argtypes = mdh + [_D, _D, ctypes.c_void_p,
                                     ctypes.c_double, _D]
    lib.grid_md_fd.argtypes = mdh + [_D, _D, _D, ctypes.c_double, _D]
    return lib


class NativeOracle:
    """Single-state float64 dynamics on the host, implemented in C++."""

    def __init__(self, desc: RobotDescription):
        self.n = desc.n
        Xb, Xs, Xc = joint_xform_coefficients(desc)
        self._Xb = np.ascontiguousarray(Xb.reshape(self.n, 36))
        self._Xs = np.ascontiguousarray(Xs.reshape(self.n, 36))
        self._Xc = np.ascontiguousarray(Xc.reshape(self.n, 36))
        self._S = np.ascontiguousarray(joint_motion_subspaces(desc))
        self._I = np.ascontiguousarray(desc.inertia.reshape(self.n, 36))
        self._damping = np.ascontiguousarray(desc.damping, np.float64)
        self._armature = np.ascontiguousarray(
            np.zeros(self.n) if desc.armature is None else desc.armature,
            np.float64)
        self._parents = np.asarray(desc.topology.parents, np.int32)
        self._jtype = np.asarray(
            [1 if t == "prismatic" else 0 for t in desc.joint_types], np.int32)
        self._I_base = np.ascontiguousarray(desc.base_inertia.reshape(36))
        self._lib = _load()

    def _hdr(self):
        return (self.n, self._parents, self._jtype, self._Xb, self._Xs,
                self._Xc, self._S, self._I, self._damping, self._armature)

    def rnea(self, q, qd, qdd=None, gravity=-9.81):
        out = np.zeros(self.n)
        # keep the contiguous copy alive across the call
        qdd_arr = (np.ascontiguousarray(qdd, np.float64)
                   if qdd is not None else None)
        qdd_p = qdd_arr.ctypes.data if qdd_arr is not None else None
        self._lib.grid_rnea(*self._hdr(), np.ascontiguousarray(q, np.float64),
                            np.ascontiguousarray(qd, np.float64), qdd_p,
                            gravity, out)
        return out

    def minv(self, q):
        out = np.zeros((self.n, self.n))
        self._lib.grid_minv(*self._hdr(),
                            np.ascontiguousarray(q, np.float64), out)
        return out

    def fd(self, q, qd, u, gravity=-9.81):
        out = np.zeros(self.n)
        self._lib.grid_fd(*self._hdr(), np.ascontiguousarray(q, np.float64),
                          np.ascontiguousarray(qd, np.float64),
                          np.ascontiguousarray(u, np.float64), gravity, out)
        return out

    def fd_grad(self, q, qd, u, gravity=-9.81):
        out = np.zeros((self.n, 2 * self.n))
        self._lib.grid_fd_grad(*self._hdr(),
                               np.ascontiguousarray(q, np.float64),
                               np.ascontiguousarray(qd, np.float64),
                               np.ascontiguousarray(u, np.float64), gravity,
                               out)
        return out

    def fb_stance(self, quat, pos, q, vb, qd, tau, links, offsets,
                  anchors=None, gravity=-9.81, baumgarte=(0.0, 0.0),
                  reg=0.0):
        """Stance-phase free-flyer FD (feet pinned to world anchors) — the
        independent oracle for
        ``ops/contact.py::fb_constrained_forward_dynamics``. The contact
        bias J̇·v is computed analytically from the moving-base spatial
        sweep (not by autodiff). Returns ``(v̇b (6,), q̈ (n,), λ (3k,))``."""
        n, k = self.n, len(links)
        quat, pos, q, vb, qd, tau = (np.ascontiguousarray(x, np.float64)
                                     for x in (quat, pos, q, vb, qd, tau))
        links_a = np.asarray(links, np.int32)
        offs = np.ascontiguousarray(offsets, np.float64).reshape(k * 3)
        anch = (None if anchors is None
                else np.ascontiguousarray(anchors, np.float64).reshape(k * 3))
        dvb, qdd, lam = np.zeros(6), np.zeros(n), np.zeros(3 * k)
        self._lib.grid_fb_stance(
            *self._hdr(), self._I_base, quat, pos, q, vb, qd, tau,
            k, links_a, offs,
            None if anch is None else anch.ctypes.data,
            float(gravity), float(baumgarte[0]), float(baumgarte[1]),
            float(reg), dvb, qdd, lam)
        return dvb, qdd, lam

    def fb_step_ground(self, state, tau, dt, links, offsets, mu=0.8,
                       ground_z=0.0, gravity=-9.81, iters=30, erp=0.2,
                       margin=1e-3, restitution=0.0):
        """One frictional ground step of the free-flyer — the independent
        oracle for ``ops/contact.py::fb_step_ground`` (and the fused TPU
        stepper). ``state = (quat, pos, q, vb, qd)``; returns
        ``(next_state, impulses (k, 3))``."""
        quat, pos, q, vb, qd = (np.ascontiguousarray(x, np.float64)
                                for x in state)
        n, k = self.n, len(links)
        links_a = np.asarray(links, np.int32)
        offs = np.ascontiguousarray(offsets, np.float64).reshape(k * 3)
        mu_a = np.ascontiguousarray(np.broadcast_to(
            np.asarray(mu, np.float64), (k,)))
        quat2, pos2 = np.zeros(4), np.zeros(3)
        q2, vb2, qd2 = np.zeros(n), np.zeros(6), np.zeros(n)
        imp = np.zeros(k * 3)
        self._lib.grid_fb_step_ground(
            *self._hdr(), self._I_base, quat, pos, q, vb, qd,
            np.ascontiguousarray(tau, np.float64), float(dt), k, links_a,
            offs, mu_a, float(ground_z), float(gravity), int(iters),
            float(erp), float(margin), float(restitution),
            quat2, pos2, q2, vb2, qd2, imp)
        return (quat2, pos2, q2, vb2, qd2), imp.reshape(k, 3)

    def fb_fd(self, quat, q, vb, qd, tau, gravity=-9.81):
        """Free-flyer forward dynamics (quaternion base) — the independent
        oracle for ``ops/freeflyer.py::fb_forward_dynamics``."""
        dvb = np.zeros(6)
        qdd = np.zeros(self.n)
        self._lib.grid_fb_fd(*self._hdr(), self._I_base,
                             np.ascontiguousarray(quat, np.float64),
                             np.ascontiguousarray(q, np.float64),
                             np.ascontiguousarray(vb, np.float64),
                             np.ascontiguousarray(qd, np.float64),
                             np.ascontiguousarray(tau, np.float64),
                             gravity, dvb, qdd)
        return dvb, qdd


_MD_JT = {"revolute": 0, "continuous": 0, "prismatic": 1, "spherical": 2,
          "floating": 3}


class NativeMdOracle:
    """Single-state float64 GENERALIZED dynamics (spherical + in-tree
    floating joints, quaternion coordinates, nq != nv) — the independent
    oracle for ``ops/multidof.py`` (md_rnea / md_forward_dynamics)."""

    def __init__(self, model):
        # model: ops.multidof.MultiDofModel (constants re-read as float64)
        self.n = model.n_joints
        self.nv = model.nv
        self.nq = model.nq
        self._parents = np.asarray(model.topology.parents, np.int32)
        self._jtype = np.asarray([_MD_JT[t] for t in model.joint_types],
                                 np.int32)
        self._qs = np.asarray([s for s, _ in model.q_slices], np.int32)
        self._vs = np.asarray([s for s, _ in model.v_slices], np.int32)
        self._XT = np.ascontiguousarray(
            np.asarray(model.XT, np.float64).reshape(self.n, 36))
        self._axis = np.ascontiguousarray(np.asarray(model.axis, np.float64))
        self._I = np.ascontiguousarray(
            np.asarray(model.inertia, np.float64).reshape(self.n, 36))
        self._damping = np.ascontiguousarray(
            np.asarray(model.damping, np.float64))
        self._armature = np.ascontiguousarray(
            np.asarray(model.armature, np.float64))
        self._lib = _load()

    def _hdr(self):
        return (self.n, self.nv, self.nq, self._parents, self._jtype,
                self._qs, self._vs, self._XT, self._axis, self._I,
                self._damping, self._armature)

    def md_id(self, q, qd, qdd=None, gravity=-9.81):
        out = np.zeros(self.nv)
        qdd_arr = (np.ascontiguousarray(qdd, np.float64)
                   if qdd is not None else None)
        qdd_p = qdd_arr.ctypes.data if qdd_arr is not None else None
        self._lib.grid_md_id(*self._hdr(),
                             np.ascontiguousarray(q, np.float64),
                             np.ascontiguousarray(qd, np.float64), qdd_p,
                             gravity, out)
        return out

    def md_fd(self, q, qd, u, gravity=-9.81):
        out = np.zeros(self.nv)
        self._lib.grid_md_fd(*self._hdr(),
                             np.ascontiguousarray(q, np.float64),
                             np.ascontiguousarray(qd, np.float64),
                             np.ascontiguousarray(u, np.float64), gravity,
                             out)
        return out
