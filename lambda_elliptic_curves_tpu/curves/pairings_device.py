"""Batched device pairings: Miller loops over the TPU, shared final exp.

Parity: ``IsPairing::compute_batch`` (``math/src/elliptic_curve/
short_weierstrass/curves/bls12_381/pairing.rs:96``) — the reference runs
one Miller loop per pair on the CPU and shares the final exponentiation.
Here the *batch axis is the parallel axis*: all B Miller loops advance in
lock-step as one ``lax.scan`` over the (static) bit pattern of the loop
parameter, every step doing batched Fp2 projective double/add line
computation plus a batched sparse Fp12 line multiplication
(``mul_by_014``/``mul_by_034``).  The scan body is traced once, so the
compiled program is small regardless of the 64–66 iteration count.

The final exponentiation stays on the host (`Tower.final_exponentiation`)
— it is O(1) per *batch*, not per pair, exactly the reference's sharing
structure.

Field layout: the device tower composes :class:`DeviceQuadraticField` /
:class:`DeviceCubicField` (flat digit stacking), so an Fp12 batch is one
``(12*K, B)`` uint32 array and the host tower tuples round-trip through
``to_tuples``/``array`` unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.extensions import DeviceCubicField, DeviceQuadraticField
from ..utils.errors import PairingError
from .pairings import PairingConfig, check_subgroup


# ---------------------------------------------------------------------------
# device tower construction (cached per pairing config)
# ---------------------------------------------------------------------------

_tower_cache: dict = {}


def device_tower(cfg: PairingConfig):
    """(fp2d, fp6d, fp12d) device tower for a pairing config."""
    if cfg.name in _tower_cache:
        return _tower_cache[cfg.name]
    base = cfg.g1_curve.field
    fp2d = DeviceQuadraticField(base, cfg.fp2.non_residue,
                                name=f"{cfg.name}_fp2d")
    fp6d = DeviceCubicField(fp2d, cfg.fp6.non_residue,
                            name=f"{cfg.name}_fp6d")
    fp12d = DeviceQuadraticField(fp6d, fp6d.generator_tuple(),
                                 name=f"{cfg.name}_fp12d")
    _tower_cache[cfg.name] = (fp2d, fp6d, fp12d)
    return _tower_cache[cfg.name]


# ---------------------------------------------------------------------------
# sparse Fp6/Fp12 device helpers (mirror Tower.f6_mul_by_01 / mul_by_014 /
# mul_by_034 — the proven host formulas, batched)
# ---------------------------------------------------------------------------

def _f6_mul_by_01(fp6d, a, c0, c1):
    """a * (c0 + c1 v) with a in Fp6, c0/c1 in Fp2 — 3 Fp2 muls + xi."""
    f2 = fp6d.base
    a0, a1, a2 = fp6d.split(a)
    t0 = f2.mul(a0, c0)
    t1 = f2.mul(a1, c1)
    o0 = f2.add(t0, fp6d._mul_res(f2.mul(a2, c1)))
    o1 = f2.sub(f2.sub(f2.mul(f2.add(a0, a1), f2.add(c0, c1)), t0), t1)
    o2 = f2.add(f2.mul(a2, c0), t1)
    return fp6d.join(o0, o1, o2)


def _f6_mul_by_1(fp6d, a, c1):
    """a * (c1 v), sparse."""
    f2 = fp6d.base
    a0, a1, a2 = fp6d.split(a)
    return fp6d.join(fp6d._mul_res(f2.mul(a2, c1)),
                     f2.mul(a0, c1), f2.mul(a1, c1))


def _f6_scale(fp6d, a, c):
    f2 = fp6d.base
    return fp6d.join(*(f2.mul(x, c) for x in fp6d.split(a)))


def _mul_by_014(fp12d, fp6d, f, c0, c1, c4):
    """f * ((c0, c1, 0) + (0, c4, 0) w) — M-twist line shape."""
    f2 = fp6d.base
    g, h = fp12d.split(f)
    t0 = _f6_mul_by_01(fp6d, g, c0, c1)
    t1 = _f6_mul_by_1(fp6d, h, c4)
    mid = _f6_mul_by_01(fp6d, fp6d.add(g, h), c0, f2.add(c1, c4))
    return fp12d.join(fp6d.add(t0, fp6d.mul_by_gen(t1)),
                      fp6d.sub(fp6d.sub(mid, t0), t1))


def _mul_by_034(fp12d, fp6d, f, c0, c3, c4):
    """f * ((c0, 0, 0) + (c3, c4, 0) w) — D-twist line shape."""
    f2 = fp6d.base
    g, h = fp12d.split(f)
    t0 = _f6_scale(fp6d, g, c0)
    t1 = _f6_mul_by_01(fp6d, h, c3, c4)
    mid = _f6_mul_by_01(fp6d, fp6d.add(g, h), f2.add(c0, c3), c4)
    return fp12d.join(fp6d.add(t0, fp6d.mul_by_gen(t1)),
                      fp6d.sub(fp6d.sub(mid, t0), t1))


# ---------------------------------------------------------------------------
# batched twist-curve steps (device mirror of pairings._tw_double/_tw_add)
# ---------------------------------------------------------------------------

def _scalar2(f2, k: int, a):
    """Small-int scalar multiple of an Fp2 batch by repeated addition
    (k in {2,3,4,8} — cheaper than a full Montgomery constant multiply)."""
    if k == 2:
        return f2.add(a, a)
    if k == 3:
        return f2.add(f2.add(a, a), a)
    if k == 4:
        t = f2.add(a, a)
        return f2.add(t, t)
    if k == 8:
        t = f2.add(a, a)
        t = f2.add(t, t)
        return f2.add(t, t)
    raise ValueError(k)


def _tw_double_dev(f2, T):
    """Projective doubling on E'(Fp2) (a = 0) + line coefficients.
    Same formulas as the host ``pairings._tw_double``."""
    X, Y, Z = T
    xx = f2.square(X)
    w3 = _scalar2(f2, 3, xx)
    s = f2.mul(Y, Z)
    yy = f2.square(Y)
    b = f2.mul(f2.mul(X, yy), Z)
    h = f2.sub(f2.square(w3), _scalar2(f2, 8, b))
    x3 = _scalar2(f2, 2, f2.mul(h, s))
    ys2 = f2.square(f2.mul(Y, s))
    y3 = f2.sub(f2.mul(w3, f2.sub(_scalar2(f2, 4, b), h)),
                _scalar2(f2, 8, ys2))
    z3 = _scalar2(f2, 8, f2.mul(f2.square(s), s))
    c_c = f2.sub(_scalar2(f2, 3, f2.mul(X, xx)),
                 _scalar2(f2, 2, f2.mul(yy, Z)))
    c_x = f2.neg(f2.mul(w3, Z))
    c_y = _scalar2(f2, 2, f2.mul(s, Z))
    return (x3, y3, z3), (c_c, c_x, c_y)


def _tw_add_dev(f2, T, Q):
    """Mixed projective addition T + Q on E'(Fp2) + line coefficients.
    Same formulas as the host ``pairings._tw_add``."""
    X, Y, Z = T
    x2, y2 = Q
    theta = f2.sub(Y, f2.mul(y2, Z))
    lam = f2.sub(X, f2.mul(x2, Z))
    c_c = f2.sub(f2.mul(theta, x2), f2.mul(lam, y2))
    c_x = f2.neg(theta)
    c_y = lam
    u = f2.neg(theta)
    v = f2.neg(lam)
    vv = f2.square(v)
    vvv = f2.mul(vv, v)
    a = f2.sub(f2.sub(f2.mul(f2.square(u), Z), vvv),
               _scalar2(f2, 2, f2.mul(vv, X)))
    x3 = f2.mul(v, a)
    y3 = f2.sub(f2.mul(u, f2.sub(f2.mul(vv, X), a)), f2.mul(vvv, Y))
    z3 = f2.mul(vvv, Z)
    return (x3, y3, z3), (c_c, c_x, c_y)


def _apply_line_dev(cfg, fp12d, fp6d, f, coeffs, xp_e, yp_e):
    """Multiply f by the line value; xp_e/yp_e are the G1 affine coords
    embedded into Fp2 (imaginary part zero), so the Fp2-by-Fp scalings are
    plain Fp2 muls on the batch."""
    f2 = fp6d.base
    c_c, c_x, c_y = coeffs
    cx = f2.mul(c_x, xp_e)
    cy = f2.mul(c_y, yp_e)
    if cfg.twist_type == "M":
        return _mul_by_014(fp12d, fp6d, f, c_c, cx, cy)
    return _mul_by_034(fp12d, fp6d, f, cy, cx, c_c)


# ---------------------------------------------------------------------------
# the batched Miller loop
# ---------------------------------------------------------------------------

def _fp12_sq_dev(fp12d, fp6d, a):
    """(g + hw)^2 Karatsuba with the sparse v-multiply (mirrors
    ``Tower.f12_sq``)."""
    g, h = fp12d.split(a)
    t = fp6d.mul(g, h)
    s = fp6d.mul(fp6d.add(g, h), fp6d.add(g, fp6d.mul_by_gen(h)))
    c0 = fp6d.sub(fp6d.sub(s, t), fp6d.mul_by_gen(t))
    return fp12d.join(c0, fp6d.add(t, t))


def miller_loop_batch(cfg: PairingConfig, xp, yp, xq, yq):
    """Batched twist-native Miller loops: xp/yp are (K, B) base-field
    digit arrays (G1 affine), xq/yq are (2K, B) Fp2 arrays (G2 affine on
    the twist).  Returns the (12K, B) Fp12 batch of f_{m,Q_i}(P_i).

    One ``lax.scan`` over the loop parameter's bits; the conditional-add
    branch is computed unconditionally and selected per static bit — but
    since the bit pattern is *static*, the scan runs over the two bit
    phases with ``jnp.where``-free Python selection at trace time via a
    per-step bit input array.
    """
    fp2d, fp6d, fp12d = device_tower(cfg)
    B = xp.shape[-1]

    # embed G1 coords into Fp2 (zero imaginary part)
    xp_e = fp2d.embed(xp)
    yp_e = fp2d.embed(yp)
    Q = (xq, yq)

    m = abs(cfg.x_param) if cfg.family == "bls" else abs(6 * cfg.x_param + 2)
    bits = jnp.asarray([int(b) for b in bin(m)[3:]], dtype=jnp.uint32)

    f0 = fp12d.ones((B,))
    T0 = (xq, yq, fp2d.ones((B,)))

    def step(carry, bit):
        f, X, Y, Z = carry
        f = _fp12_sq_dev(fp12d, fp6d, f)
        (X, Y, Z), coeffs = _tw_double_dev(fp2d, (X, Y, Z))
        f = _apply_line_dev(cfg, fp12d, fp6d, f, coeffs, xp_e, yp_e)
        # conditional add, selected by the (traced) bit
        (Xa, Ya, Za), coeffs_a = _tw_add_dev(fp2d, (X, Y, Z), Q)
        fa = _apply_line_dev(cfg, fp12d, fp6d, f, coeffs_a, xp_e, yp_e)
        take = bit.astype(bool)
        f = fp12d.select(take, fa, f)
        X = fp2d.select(take, Xa, X)
        Y = fp2d.select(take, Ya, Y)
        Z = fp2d.select(take, Za, Z)
        return (f, X, Y, Z), None

    (f, X, Y, Z), _ = jax.lax.scan(step, (f0,) + T0, bits)

    if cfg.family == "bls":
        if cfg.x_is_negative:
            f = fp12d.conjugate(f)
        return f

    # BN family: Frobenius correction lines (device mirror of
    # pairings.miller_loop's tail; gamma constants from the host tower)
    t = cfg.tower
    if 6 * cfg.x_param + 2 < 0:
        f = fp12d.conjugate(f)
        Y = fp2d.neg(Y)

    def f2_conj(a):
        c0, c1 = fp2d.split(a)
        return fp2d.join(c0, cfg.g1_curve.field.neg(c1))

    def g2_endo(Qx, Qy):
        g2c = fp2d.constant(t.gamma[2], (B,))
        g3c = fp2d.constant(t.gamma[3], (B,))
        return fp2d.mul(f2_conj(Qx), g2c), fp2d.mul(f2_conj(Qy), g3c)

    q1x, q1y = g2_endo(xq, yq)
    q2x, q2y = g2_endo(q1x, q1y)
    q2y = fp2d.neg(q2y)
    (X, Y, Z), coeffs = _tw_add_dev(fp2d, (X, Y, Z), (q1x, q1y))
    f = _apply_line_dev(cfg, fp12d, fp6d, f, coeffs, xp_e, yp_e)
    (X, Y, Z), coeffs = _tw_add_dev(fp2d, (X, Y, Z), (q2x, q2y))
    f = _apply_line_dev(cfg, fp12d, fp6d, f, coeffs, xp_e, yp_e)
    return f


_miller_jit_cache: dict = {}


def _miller_jit(cfg: PairingConfig):
    if cfg.name not in _miller_jit_cache:
        _miller_jit_cache[cfg.name] = jax.jit(
            lambda xp, yp, xq, yq: miller_loop_batch(cfg, xp, yp, xq, yq))
    return _miller_jit_cache[cfg.name]


def compute_batch_device(cfg: PairingConfig, pairs, check_subgroups=True,
                         min_batch=1):
    """Product of pairings prod_i e(P_i, Q_i) with the Miller loops batched
    on device and one shared host final exponentiation (the
    ``compute_batch`` contract, ``pairing.rs:96``).

    ``pairs``: list of (P, Q) with P a G1 ``ProjectivePoint`` and Q a G2
    ``AffinePoint`` over Fp2 (same types as :func:`pairings.compute_batch`).
    Pads the batch up to a power of two (>= ``min_batch``) with (G, G2gen)
    dummies that are masked out of the product, so repeated calls reuse a
    handful of compiled programs.
    """
    t = cfg.tower
    fp2d, fp6d, fp12d = device_tower(cfg)
    base = cfg.g1_curve.field

    live = []
    for p, q in pairs:
        if check_subgroups:
            if not check_subgroup(cfg, p, is_g2=False) or \
                    not check_subgroup(cfg, q, True):
                raise PairingError("point not in the r-torsion subgroup")
        if p.to_affine().z == 0 or q.inf:
            continue
        live.append((p.to_affine(), q))
    if not live:
        return cfg.fp12(1)

    B = max(min_batch, 1 << (len(live) - 1).bit_length())
    gp = cfg.g1_curve.generator().to_affine()
    gq = cfg.g2_generator()
    n_live = len(live)
    while len(live) < B:
        live.append((gp, gq))

    xp = base.array([int(p.x) for p, _ in live])
    yp = base.array([int(p.y) for p, _ in live])
    xq = fp2d.array([tuple(int(c) for c in q.x.value) for _, q in live])
    yq = fp2d.array([tuple(int(c) for c in q.y.value) for _, q in live])

    fs = _miller_jit(cfg)(xp, yp, xq, yq)
    tuples = fp12d.to_tuples(fs)[:n_live]

    acc = t.one()
    for v in tuples:
        acc = t.f12_mul(acc, v)
    return cfg.fp12(t.final_exponentiation(acc, cfg.r))
