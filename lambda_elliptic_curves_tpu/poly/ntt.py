"""Number-theoretic transform (FFT over two-adic prime fields).

Parity surface: ``Polynomial::evaluate_fft / evaluate_offset_fft /
interpolate_fft / interpolate_offset_fft`` (``math/src/fft/polynomial.rs:
25,74,87,121``) and the twiddle/roots helpers
(``math/src/fft/cpu/roots_of_unity.rs:13-77``).

TPU-native design: the radix-2 DIT butterfly network is expressed as
``log2(n)`` reshape-broadcast-multiply array steps over digit-major
Montgomery arrays — each stage is a single fused elementwise pass at full
VPU width, with the twiddle vector broadcast across each butterfly group
(XLA materialises no per-butterfly control flow).  The output bit-reverse is
one static gather.  The same function serves every two-adic field because
fields are parameter records, not types.

Conventions match the reference exactly:
* ``fft`` returns evaluations in natural order: out[i] = P(w^i), with w the
  2^k-th principal root derived from the field's pinned two-adic generator
  by repeated squaring (``math/src/field/traits.rs:82``).
* ``interpolate_fft`` is its exact inverse (scales by n^{-1}).
* offset variants scale coefficients by offset powers before the transform
  (``evaluate_offset_fft``/``scale``, ``math/src/fft/polynomial.rs:74``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.field import PrimeField
from ..utils.errors import FFTError


# ---------------------------------------------------------------------------
# roots / twiddles
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def bit_reverse_permute(x, axis=-1):
    """Static bit-reverse gather along ``axis`` (counterpart of
    ``in_place_bit_reverse_permute``, ``math/src/fft/cpu/bit_reversing.rs:2``)."""
    n = x.shape[axis]
    return jnp.take(x, jnp.asarray(_bitrev_indices(n)), axis=axis)


@functools.lru_cache(maxsize=None)
def _powers_runner(field: PrimeField, logc: int, count: int):
    def run(ctab, acc):
        iota = jax.lax.broadcasted_iota(jnp.uint32, (1, count), 1)[0]

        def body(j, acc):
            cj = jax.lax.dynamic_slice_in_dim(ctab, j, 1, axis=-1)  # (K, 1)
            bit = (iota >> j.astype(jnp.uint32)) & 1
            return field.select(bit == 1, field.mul(acc, cj), acc)

        return jax.lax.fori_loop(0, logc, body, acc)

    return jax.jit(run)


def _tracing_active() -> bool:
    """True when called during a jax trace (jit/scan/...).

    Twiddle-table helpers must not CACHE results computed under a trace
    (they would leak tracers), and must not REPLAY concrete cached arrays
    into a trace either: a multi-megabyte table would be embedded into
    the module as a literal constant (the tunneled TPU backend rejects
    such modules — HTTP 413 on remote compile).  In-graph recomputation
    is cheap: the powers ladder is O(log n) fused passes.
    """
    try:
        from jax._src import core as _core

        return not isinstance(_core.trace_ctx.trace, _core.EvalTrace)
    except Exception:
        return True  # conservative: never cache if we cannot tell


_powers_cache: dict = {}


def powers(field: PrimeField, base_int: int, count: int, offset_int: int = 1):
    """Montgomery digit array (K, count) of offset * base^i, i in 0..count.

    Square-and-multiply over the *index bits*: entry i multiplies the
    constants base^(2^j) for each set bit j of i.  The constants are
    Python-int precomputed, so the device program is a fixed-shape
    ``fori_loop`` whose body is one select-multiply — one compile per
    count, O(count * log count) lane-parallel multiplies (the SPMD
    replacement for the reference's sequential successor scan,
    ``roots_of_unity.rs:34``).

    Results are cached only for eager calls; under a trace the (small)
    ladder graph is emitted inline — see :func:`_tracing_active`.
    """
    p = field.p
    if count <= 1:
        return field.constant(offset_int % p, (max(count, 1),))
    tracing = _tracing_active()
    key = (field, base_int, count, offset_int)
    if not tracing and key in _powers_cache:
        return _powers_cache[key]
    logc = (count - 1).bit_length()
    fp = field.params
    # base^(2^j) in Montgomery form, as a (K, logc) host constant table
    tab = np.zeros((fp.num_digits, logc), np.uint32)
    for j in range(logc):
        v = (pow(base_int, 1 << j, p) * fp.r) % p
        for k in range(fp.num_digits):
            tab[k, j] = (v >> (fp.digit_bits * k)) & fp.digit_mask
    acc = field.constant(offset_int % p, (count,))
    out = _powers_runner(field, logc, count)(jnp.asarray(tab), acc)
    if not tracing:
        _powers_cache[key] = out
    return out


def get_powers_of_primitive_root(field: PrimeField, order: int, count: int,
                                 config: str = "natural"):
    """Powers of the 2^order primitive root in one of the four reference
    configurations (``RootsConfig``, ``math/src/field/traits.rs:10``):
    natural | natural_inversed | bit_reverse | bit_reverse_inversed."""
    root = field.params.primitive_root_of_unity(order)
    if config in ("natural_inversed", "bit_reverse_inversed"):
        root = pow(root, field.p - 2, field.p)
    n = count
    if config.startswith("bit_reverse"):
        # bit-reverse order needs the full power-of-two table
        n = max(1, 1 << (count - 1).bit_length()) if count > 1 else 1
    out = powers(field, root, n)
    if config.startswith("bit_reverse"):
        out = bit_reverse_permute(out)
    return out[..., :count] if not config.startswith("bit_reverse") else out


def get_twiddles(field: PrimeField, order: int, config: str = "bit_reverse"):
    """n/2 twiddle factors for a 2^order transform (cf. ``get_twiddles``,
    ``roots_of_unity.rs:66``)."""
    if order > field.two_adicity:
        raise FFTError(
            f"{field.name}: order {order} exceeds two-adicity {field.two_adicity}"
        )
    return get_powers_of_primitive_root(field, order, (1 << order) // 2, config)


# ---------------------------------------------------------------------------
# core transform
# ---------------------------------------------------------------------------

_tw_cache: dict = {}   # (field, root_int, n) -> (K, n/2) bit-reversed
_mat_cache: dict = {}  # (field, root_int, n2, n1) -> (K, N2, N1) w^(j2*k1)

# Above this size, split as N1*N2 (four-step): two batched local transforms
# around one twiddle multiply and two transposes.  Local transforms then
# run over a short contiguous axis with big batch dims, so the per-stage
# twiddle gather and perfect shuffle touch only the small axis.
_FOUR_STEP_MIN = 1 << 14


def _local_twiddles(field: PrimeField, root_int: int, n: int):
    key = (field, root_int, n)
    tracing = _tracing_active()
    if not tracing and key in _tw_cache:
        return _tw_cache[key]
    tw = bit_reverse_permute(powers(field, root_int, max(n // 2, 1)))
    if not tracing:
        _tw_cache[key] = tw
    return tw


def _twiddle_matrix(field: PrimeField, root_int: int, n2: int, n1: int):
    """(K, N2, N1) table with [j2, k1] = root^(j2*k1): the cross twiddles of
    the four-step split, built by log2(N1) doubling steps over the column
    vector of w^j2 (cached per field/root/size)."""
    key = (field, root_int, n2, n1)
    tracing = _tracing_active()
    if not tracing and key in _mat_cache:
        return _mat_cache[key]
    base = powers(field, root_int, n2)  # (K, N2): w^j2
    acc = field.ones((n2, 1))
    step = base[..., None]
    built = 1
    while built < n1:
        nxt = field.mul(acc, jnp.broadcast_to(step, acc.shape))
        acc = jnp.concatenate([acc, nxt], axis=-1)
        step = field.square(step)
        built *= 2
    out = acc[..., :n1]
    if not tracing:
        _mat_cache[key] = out
    return out


def fft_with_root(x, field: PrimeField, root_int: int, canonical: bool = True,
                  local_fn=None, max_local: int | None = None):
    """Natural-order transform along the last axis with an explicit
    primitive root (any power-of-two length, any batch dims).

    Large transforms use the four-step N = N1*N2 decomposition
    X[k2*N1 + k1] = sum_j2 w_N2^(j2 k2) [w^(j2 k1) sum_j1 w_N1^(j1 k1) x[j1*N2+j2]]
    (the single-chip analogue of the sharded NTT's all-to-all,
    ``parallel/ntt_sharded.py``); local transforms use the constant-geometry
    network of :func:`_fft_pease` by default, or ``local_fn`` when given
    (same signature/contract as ``_fft_pease`` — the hook the Pallas
    VMEM-resident kernel plugs into, :mod:`.ntt_pallas`).

    ``max_local`` caps the local transform length: instead of the balanced
    ``sqrt(n)`` split, the decomposition is *unbalanced* — n2 is pinned to
    ``max_local`` (the bulk second transform, which then runs entirely in
    the local kernel) and the recursion continues on n1 = n / n2.  This is
    how the VMEM-bounded Pallas kernel covers arbitrarily large n with
    1024-point locals.

    With ``canonical=False`` the result may be a lazy representative:
    returns ``(y, value_bound)`` and skips the final reduction passes
    (used by :func:`ifft`, whose n^-1 scaling multiply canonicalises for
    free).
    """
    local = local_fn or _fft_pease
    n = x.shape[-1]
    limit = _FOUR_STEP_MIN if max_local is None else min(_FOUR_STEP_MIN,
                                                         max_local)
    if n <= limit:
        return local(x, field, root_int, canonical)

    log_n = n.bit_length() - 1
    if max_local is not None:
        # unbalanced: bulk local length pinned to max_local, recurse on n1
        log_n2 = min(log_n - 1, max_local.bit_length() - 1)
        log_n1 = log_n - log_n2
    else:
        log_n1 = (log_n + 1) // 2
    n1 = 1 << log_n1
    n2 = n >> log_n1
    K = x.shape[0]
    batch = x.shape[1:-1]

    xm = x.reshape((K,) + batch + (n1, n2))
    xt = jnp.swapaxes(xm, -1, -2)  # (..., j2, j1)
    # the cross-twiddle multiply is a strict Montgomery product, which
    # canonicalises lazy local-transform output for free
    a, _ = fft_with_root(xt, field, pow(root_int, n2, field.p),
                         canonical=False, local_fn=local_fn,
                         max_local=max_local)  # A[j2,k1], lazy
    t = _twiddle_matrix(field, root_int, n2, n1)
    t = t.reshape((K,) + (1,) * len(batch) + (n2, n1))
    b = field.mul(a, t)
    bt = jnp.swapaxes(b, -1, -2)  # (..., k1, j2)
    c, c_bound = fft_with_root(bt, field, pow(root_int, n1, field.p),
                               canonical=False, local_fn=local_fn,
                               max_local=max_local)  # C[k1, k2], lazy
    out = jnp.swapaxes(c, -1, -2)  # (..., k2, k1): flatten = k2*N1 + k1
    out = out.reshape((K,) + batch + (n,))
    if canonical:
        return _canonicalize(out, c_bound, field.params)
    return out, c_bound


@functools.lru_cache(maxsize=None)
def _jit_lazy_ops(fp, inv: int, red: int):
    """Cached jitted lazy butterfly kernels for one (field, invariant).

    Wrapping each op in its own ``jax.jit`` is load-bearing beyond
    dispatch caching: under an outer trace a jitted closure lowers to ONE
    shared XLA subcomputation per shape, while inlining the digit-kernel
    graph at every call site would multiply the serialized module size
    (the tunneled backend rejects oversized modules on remote compile).
    """
    from ..ops import limbs

    p = fp.p
    wb_bound = (p * inv) // (1 << (fp.digit_bits * fp.num_digits)) + p + 1
    return {
        "mul": jax.jit(
            lambda w, b: limbs.mont_mul_lazy(w, b, fp, p * inv)[0]
        ),
        "add": jax.jit(
            lambda a, wb: limbs.add_raw(a, wb, fp, inv + wb_bound)
        ),
        "sub": jax.jit(
            lambda a, wb: limbs.sub_offset_raw(a, wb, 2 * p, fp, inv + 2 * p)
        ),
        "csub": jax.jit(lambda x: limbs.cond_sub_const(x, red, fp)),
        "peel_add": jax.jit(lambda a, b: limbs.add_raw(a, b, fp, 2 * p)),
        "peel_sub": jax.jit(
            lambda a, b: limbs.sub_offset_raw(a, b, p, fp, 2 * p)
        ),
    }


@functools.lru_cache(maxsize=None)
def _jit_cond_sub(fp, c_value: int):
    from ..ops import limbs

    return jax.jit(lambda x: limbs.cond_sub_const(x, c_value, fp))


def _lazy_tier(fp) -> int:
    """How much reduction laziness the field's digit headroom allows.

    2: R >= 8p — butterfly values ride in [0, 4p), conditional subtracts
       batched per PAIR of stages (Stark252-class fields).
    1: R >= 4p — values in [0, 2p), one conditional subtract per branch
       per stage; the multiplier's final subtract is still skipped.
    0: no headroom (Goldilocks/BabyBear-class where p ~ R) — strict ops.
    """
    r = 1 << (fp.digit_bits * fp.num_digits)
    if r >= 8 * fp.p:
        return 2
    if r > 4 * fp.p:
        return 1
    return 0


def _fft_pease(x, field: PrimeField, root_int: int, canonical: bool = True):
    """Natural-order transform along the last axis with an explicit
    primitive root (any power-of-two length, any batch dims).

    Constant-geometry (Pease) radix-2 DIT: every stage performs the SAME
    data movement — butterfly partner is always at distance n/2, followed
    by one perfect shuffle — so the whole transform is a single
    ``lax.fori_loop`` whose body holds exactly one Montgomery multiply.
    Compiled graph size is therefore O(1) in n (vs O(log n) unrolled
    stages), which matters both for compile latency and for keeping live
    HBM bounded at a few copies of the array.

    Derivation from the in-place NR network (``math/src/fft/cpu/fft.rs:20``):
    stage s of NR butterflies on index bit (S-1-s) with twiddle
    ``tw_br[top s bits]``.  Re-indexing the array at stage s by rotating
    the index bits right by s turns the butterfly bit into the TOP bit
    (constant distance n/2), makes the twiddle index ``r mod 2^s`` (the
    bottom s bits), and turns the stage-to-stage re-indexing into the
    fixed perfect shuffle y[v] <- y[rotr(v, 1)], i.e. reshape(2, n/2) ->
    transpose -> flatten.  After S stages the array is back in natural
    index order holding the bit-reversed spectrum; one static bit-reverse
    gather finishes.

    Performance structure on top of that network:

    * stage 0 is peeled — its twiddle is identically 1, so the butterfly
      is a plain add/sub (one full-width Montgomery multiply saved);
    * where the field's digit capacity R = 2^(bits*K) has headroom over p
      (``_lazy_tier``), butterflies run on *lazy representatives*: the
      Montgomery multiply accepts any K-digit operand (twiddles stay
      canonical) and always emits < 2p with its final subtract skipped,
      and the add/sub branches only reduce back under 4p once per pair of
      stages.  All value bounds are static Python ints asserted at trace
      time; a final canonicalisation keeps the public results bit-exact.
    """
    n = x.shape[-1]
    fp = field.params
    if n == 1:
        return x if canonical else (x, fp.p)
    from ..ops import limbs

    K = x.shape[0]
    batch = x.shape[1:-1]
    stages = n.bit_length() - 1
    h = n // 2
    tw_br = _local_twiddles(field, root_int, n)  # (K, n/2)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, h), 1)  # (1, h)
    bshape = (1,) * len(batch)

    def shuffle(y):
        # perfect shuffle: y[v] <- y[rotr(v, 1)]
        y = y.reshape((K,) + batch + (2, h))
        y = jnp.swapaxes(y, -1, -2)
        return y.reshape((K,) + batch + (n,))

    tier = _lazy_tier(fp)
    p = fp.p
    r_cap = 1 << (fp.digit_bits * fp.num_digits)

    # ---- strict fallback (no digit headroom over p) ----------------------
    if tier == 0:
        def body(s, y):
            a = y[..., :h]
            b = y[..., h:]
            idx = (lane & ((jnp.uint32(1) << s.astype(jnp.uint32)) - 1))[0]
            w = jnp.take(tw_br, idx, axis=-1).reshape((K,) + bshape + (h,))
            wb = field.mul(w, b)
            return shuffle(
                jnp.concatenate([field.add(a, wb), field.sub(a, wb)], axis=-1)
            )

        a0, b0 = x[..., :h], x[..., h:]
        y = shuffle(
            jnp.concatenate([field.add(a0, b0), field.sub(a0, b0)], axis=-1)
        )
        y = jax.lax.fori_loop(1, stages, body, y)
        y = bit_reverse_permute(y)
        return y if canonical else (y, fp.p)

    # ---- lazy path -------------------------------------------------------
    def tw(s_traced):
        idx = (lane & ((jnp.uint32(1) << s_traced.astype(jnp.uint32)) - 1))[0]
        return jnp.take(tw_br, idx, axis=-1).reshape((K,) + bshape + (h,))

    # single-stage loop with one conditional 2p-subtract per branch per
    # stage.  (A pair-fused variant halving the subtracts exists in git
    # history but doubles the fori_loop body; the tunnel backend rejects
    # modules that large — HTTP 413 on remote compile.)
    # tier 2 (R > 8p): invariant < 4p; tier 1 (R > 4p): invariant < 2p.
    inv = 4 * p if tier == 2 else 2 * p
    red = 2 * p

    # check stability with exact ints
    wb_b = (p * inv) // r_cap + p + 1
    assert wb_b <= 2 * p and p * inv < r_cap * p
    assert max(red, max(inv + wb_b, inv + 2 * p) - red) <= inv
    assert max(inv + wb_b, inv + 2 * p) < r_cap
    ops = _jit_lazy_ops(fp, inv, red)

    # peel stage 0 (w == 1): canonical inputs -> values < 2p <= inv
    a0, b0 = x[..., :h], x[..., h:]
    y = shuffle(jnp.concatenate(
        [ops["peel_add"](a0, b0), ops["peel_sub"](a0, b0)], axis=-1))

    def body(s, y):
        a = y[..., :h]
        b = y[..., h:]
        w = jnp.broadcast_to(tw(s), a.shape)
        wb = ops["mul"](w, b)
        s_add = ops["csub"](ops["add"](a, wb))
        s_sub = ops["csub"](ops["sub"](a, wb))
        return shuffle(jnp.concatenate([s_add, s_sub], axis=-1))

    y = jax.lax.fori_loop(1, stages, body, y)
    bound = inv

    if canonical:
        return bit_reverse_permute(_canonicalize(y, bound, fp))
    return bit_reverse_permute(y), bound


def _canonicalize(y, bound: int, fp):
    """Reduce lazy representatives < ``bound`` to canonical [0, p) by
    conditionally subtracting power-of-two multiples of p (value mod p is
    preserved at every step)."""
    p = fp.p
    while bound > p:
        k = ((bound + p - 1) // p - 1).bit_length() - 1
        c = p << k  # p*2^k < bound <= p*2^(k+1)
        y = _jit_cond_sub(fp, c)(y)
        bound = max(c, bound - c)
    return y


def _fft_core(x, field: PrimeField, twiddles_br):
    """Radix-2 DIT NR network over the last axis; returns bit-reversed order.

    ``x``: (K, *batch, n) Montgomery digits; ``twiddles_br``: (K, n/2) in
    bit-reverse order (stage s uses its first 2^s entries, exactly like the
    reference's ``in_place_nr_2radix_fft``, ``math/src/fft/cpu/fft.rs:20`` —
    but vectorised over whole stages instead of per-butterfly loops).
    """
    K = x.shape[0]
    batch = x.shape[1:-1]
    n = x.shape[-1]
    stages = n.bit_length() - 1
    bshape = (1,) * len(batch)

    x = x.reshape((K,) + batch + (1, n))
    for s in range(stages):
        m = 1 << s
        g = x.shape[-1]
        half = g // 2
        a = x[..., :half]
        b = x[..., half:]
        w = twiddles_br[:, :m].reshape((K,) + bshape + (m, 1))
        wb = field.mul(w, b)
        x = jnp.concatenate([field.add(a, wb), field.sub(a, wb)], axis=-1)
        x = x.reshape((K,) + batch + (2 * m, half))
    return x.reshape((K,) + batch + (n,))


def _mesh_route(field, arr, inverse: bool):
    """When a ``parallel.mesh_ctx`` mesh is active and the transform
    factors across it, return the mesh-sharded result (natural order,
    protocol-exact); otherwise None (run locally)."""
    from ..parallel import mesh_ctx

    ctx = mesh_ctx.active()
    if ctx is None or arr.shape[0] != field.num_digits:
        return None
    mesh, ax = ctx
    from ..parallel.ntt_sharded import sharded_ntt, splittable

    if not splittable(arr.shape[-1], mesh.shape[ax]):
        return None
    return sharded_ntt(field, arr, mesh, ax, ordering="natural",
                       inverse=inverse)


def fft(coeffs, field: PrimeField):
    """Forward transform: natural-order coefficients -> natural-order
    evaluations P(w^i) over the size-n domain (n = last-axis length, must be
    a power of two)."""
    n = coeffs.shape[-1]
    _check_pow2(n)
    order = n.bit_length() - 1
    if order > field.two_adicity:
        raise FFTError(
            f"{field.name}: order {order} exceeds two-adicity {field.two_adicity}"
        )
    routed = _mesh_route(field, coeffs, inverse=False)
    if routed is not None:
        return routed
    return fft_with_root(coeffs, field,
                         field.params.primitive_root_of_unity(order))


def ifft(evals, field: PrimeField):
    """Inverse transform: natural-order evaluations -> coefficients."""
    n = evals.shape[-1]
    _check_pow2(n)
    order = n.bit_length() - 1
    if order > field.two_adicity:
        raise FFTError(
            f"{field.name}: order {order} exceeds two-adicity {field.two_adicity}"
        )
    routed = _mesh_route(field, evals, inverse=True)
    if routed is not None:
        return routed
    root = field.params.primitive_root_of_unity(order)
    # lazy transform output: the strict n^-1 scaling multiply reduces the
    # representatives back to canonical for free
    out, _bound = fft_with_root(
        evals, field, pow(root, field.p - 2, field.p), canonical=False
    )
    n_inv = field.constant(pow(n, field.p - 2, field.p), ())
    n_inv = n_inv.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
    return field.mul(out, jnp.broadcast_to(n_inv, out.shape))


# ---------------------------------------------------------------------------
# polynomial-level API (reference parity)
# ---------------------------------------------------------------------------

def evaluate_fft(field: PrimeField, coeffs, blowup_factor: int = 1,
                 domain_size: int | None = None):
    """Pad to next_power_of_two(max(len, domain_size)) * blowup and evaluate
    (``Polynomial::evaluate_fft``, ``math/src/fft/polynomial.rs:25``)."""
    padded = _pad_coeffs(field, coeffs, blowup_factor, domain_size)
    return fft(padded, field)


def evaluate_offset_fft(field: PrimeField, coeffs, blowup_factor: int = 1,
                        domain_size: int | None = None, offset: int = 1):
    """Evaluations over the coset offset*<w> (``fft/polynomial.rs:74``)."""
    scaled = scale_coeffs(field, coeffs, offset)
    return evaluate_fft(field, scaled, blowup_factor, domain_size)


def interpolate_fft(field: PrimeField, evals):
    """Coefficients of the polynomial interpolating (w^i, evals[i])
    (``fft/polynomial.rs:87``)."""
    return ifft(evals, field)


def interpolate_offset_fft(field: PrimeField, evals, offset: int):
    """Inverse of evaluate_offset_fft (``fft/polynomial.rs:121``)."""
    coeffs = ifft(evals, field)
    inv_off = pow(int(offset), field.p - 2, field.p)
    return scale_coeffs(field, coeffs, inv_off)


def compose_fft(field: PrimeField, poly_1, poly_2):
    """Composition p1(p2(x)) via evaluation (``compose_fft``,
    ``math/src/fft/polynomial.rs:130``): evaluate p2 over a domain large
    enough for the composition, Horner-evaluate p1 at those values,
    interpolate back.  Host polynomials in, host polynomial out."""
    from .polynomial import Polynomial

    deg = max(poly_1.degree(), 0) * max(poly_2.degree(), 1) + 1
    size = 1 << max((deg - 1).bit_length(), 0)
    evals2 = field.to_ints(evaluate_fft(field, poly_2.to_device(size)))
    values = [poly_1.evaluate(field(int(v))) for v in evals2]
    coeffs = interpolate_fft(field, field.array([v.value for v in values]))
    return Polynomial(field, [int(v) for v in field.to_ints(coeffs)])


def scale_coeffs(field: PrimeField, coeffs, factor: int):
    """coeffs[i] *= factor^i (``Polynomial::scale``, ``polynomial/mod.rs:259``)."""
    factor = int(factor) % field.p
    if factor == 1:
        return coeffs
    n = coeffs.shape[-1]
    pows = powers(field, factor, n)
    pows = pows.reshape(
        (coeffs.shape[0],) + (1,) * (coeffs.ndim - 2) + (n,)
    )
    return field.mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))


def _pad_coeffs(field, coeffs, blowup_factor, domain_size):
    n = coeffs.shape[-1]
    target = max(n, domain_size or 0)
    target = 1 << (target - 1).bit_length() if target > 1 else 1
    target *= blowup_factor
    if target < n:
        raise FFTError("domain smaller than polynomial")
    if target == n:
        return coeffs
    pad = [(0, 0)] * coeffs.ndim
    pad[-1] = (0, target - n)
    return jnp.pad(coeffs, pad)


def _check_pow2(n):
    if n & (n - 1) or n == 0:
        raise FFTError(f"size {n} is not a power of two")
