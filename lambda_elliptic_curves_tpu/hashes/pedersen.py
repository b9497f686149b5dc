"""Starknet Pedersen hash over the Stark curve.

Parity: ``crypto/src/hash/pedersen/`` — 4-bit windowed lookup-and-accumulate
starting from the shift point (spec:
https://docs.starkware.co/starkex/crypto/pedersen-hash-function.html).
The reference ships 1890 precomputed table points; here the tables are
derived at first use from the five standard base points (same values, same
table layout: 62 windows x 15 nonzero nibbles for the low 248 bits, one
window for the top nibble), cached per process.
"""

from __future__ import annotations

import functools

from ..curves.zoo import StarkCurve

SHIFT_POINT = (
    0x049EE3EBA8C1600700EE1B87EB599F16716B0B1022947733551FDE4050CA6804,
    0x03CA0CFE4B3BC6DDF346D49D06EA0ED34E621062C0E056C1D0405D266E10268A,
)
P1 = (
    0x0234287DCBAFFE7F969C748655FCA9E58FA8120B6D56EB0C1080D17957EBE47B,
    0x03B056F100F96FB21E889527D41F4E39940135DD7A6C94CC6ED0268EE89E5615,
)
P2 = (
    0x04FA56F376C83DB33F9DAB2656558F3399099EC1DE5E3018B7A6932DBA8AA378,
    0x03FA0984C931C9E38113E0C0E47E4401562761F92A7A23B45168F4E80FF5B54D,
)
P3 = (
    0x04BA4CC166BE8DEC764910F75B45F74B40C690C74709E90F3AA372F0BD2D6997,
    0x0040301CF5C1751F4B971E46C4EDE85FCAC5C59A5CE5AE7C48151F27B24B219C,
)
P4 = (
    0x054302DCB0E6CC1C6E44CCA8F61A63BB2CA65048D53FB325D36FF12C49A58202,
    0x01B77B3E37D13504B348046268D8AE25CE98AD783C25561A879DCC77E99C2426,
)

CURVE_CONST_BITS = 4
TABLE_SIZE = (1 << CURVE_CONST_BITS) - 1
LOW_BITS = 248
LOW_WINDOWS = LOW_BITS // CURVE_CONST_BITS
HIGH_WINDOWS = 1  # bits 248..251


@functools.lru_cache(maxsize=None)
def _tables():
    def build(base_xy, windows):
        base = StarkCurve.point(*base_xy)
        table = []
        current = base
        for _ in range(windows):
            acc = current
            for k in range(1, TABLE_SIZE + 1):
                table.append(acc)
                if k < TABLE_SIZE:
                    acc = acc.operate_with(current)
            current = acc.operate_with(current)  # 15*current + current = 16x
        return table

    return (
        build(P1, LOW_WINDOWS),
        build(P2, HIGH_WINDOWS),
        build(P3, LOW_WINDOWS),
        build(P4, HIGH_WINDOWS),
    )


def _accumulate(acc, value: int, low_table, high_table):
    for w in range(LOW_WINDOWS):
        nibble = (value >> (4 * w)) & 0xF
        if nibble:
            acc = acc.operate_with(low_table[w * TABLE_SIZE + nibble - 1])
    high = value >> LOW_BITS
    if high:
        acc = acc.operate_with(high_table[high - 1])
    return acc


def pedersen_hash(x: int, y: int) -> int:
    """hash(x, y) -> field element (x-coordinate of the accumulated point)."""
    t1, t2, t3, t4 = _tables()
    acc = StarkCurve.point(*SHIFT_POINT)
    acc = _accumulate(acc, int(x), t1, t2)
    acc = _accumulate(acc, int(y), t3, t4)
    return acc.to_affine().x
