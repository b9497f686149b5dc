"""Circle FFT butterflies and orderings (parity: ``math/src/circle/cfft.rs``).

Host-exact reference implementation over Python ints mod 2^31-1; the
batched device version reuses the identical layer structure over
Mersenne31 digit planes (future optimisation — the layers are the same
reshape/broadcast pattern as the multiplicative NTT).
"""

from __future__ import annotations

from .point import M31


def cfft(values: list, twiddles: list) -> list:
    """In-place-style CFFT layers: at layer i, chunks of 2^{i+1}, butterfly
    (hi, lo) -> (hi + lo*t, hi - lo*t)."""
    v = [x % M31 for x in values]
    n = len(v)
    log = n.bit_length() - 1
    for i in range(log):
        half = 1 << i
        chunk = half * 2
        for start in range(0, n, chunk):
            for j in range(half):
                hi = v[start + j]
                lo = v[start + half + j]
                temp = lo * twiddles[i][j] % M31
                v[start + j] = (hi + temp) % M31
                v[start + half + j] = (hi - temp) % M31
    return v


def icfft(values: list, twiddles: list) -> list:
    """Inverse layers: chunks shrink from n down; butterfly
    (hi, lo) -> (hi + lo, (hi - lo) * t)."""
    v = [x % M31 for x in values]
    n = len(v)
    log = n.bit_length() - 1
    for i in range(log):
        chunk = 1 << (log - i)
        half = chunk >> 1
        for start in range(0, n, chunk):
            for j in range(half):
                hi = v[start + j]
                lo = v[start + half + j]
                v[start + j] = (hi + lo) % M31
                v[start + half + j] = (hi - lo) * twiddles[i][j] % M31
    return v


def order_cfft_result(values: list) -> list:
    """[0, 2, 4, ..., n-1, ..., 5, 3, 1] -> natural order."""
    out = []
    n = len(values)
    for i in range(n // 2):
        out.append(values[i])
        out.append(values[n - i - 1])
    return out


def order_icfft_input(values: list) -> list:
    """Natural order -> [evens ascending, odds descending]."""
    return list(values[0::2]) + list(values[1::2])[::-1]


def bit_reverse(values: list) -> list:
    n = len(values)
    bits = n.bit_length() - 1
    out = [None] * n
    for i, v in enumerate(values):
        r = int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
        out[r] = v
    return out
