"""Prove a stack-VM execution (parity role: ``examples/prove-miden``).

The reference example runs a Miden-VM Fibonacci program and proves the
resulting execution trace through the winterfell adapter and the platinum
prover (``examples/prove-miden/src/main.rs:107``).  A Rust miden fork
cannot be embedded here, so this is the same *pipeline* on a miniature
stack machine:

    program (opcodes)  ->  VM executor  ->  execution trace
                       ->  foreign AIR (duck-typed)  ->  AirAdapter
                       ->  STARK prove / verify

The machine has a two-slot stack and three opcodes:

    NOOP :  (s0, s1) -> (s0, s1)
    SWAP :  (s0, s1) -> (s1, s0)
    ADD2 :  (s0, s1) -> (s0 + s1, s0)        (the Miden fib idiom
                                              ``swap dup.1 add`` collapsed)

The program is executed cyclically; its opcode selectors become PERIODIC
columns of the AIR (period = program length, so the program is pinned by
the statement itself, like Miden's program commitment pins the code).  The
transition constraints select the active semantics by multiplying each
opcode's state-update equation with its selector:

    c0 = noop*(s0' - s0) + swap*(s0' - s1) + add*(s0' - s0 - s1)
    c1 = noop*(s1' - s1) + swap*(s1' - s0) + add*(s1' - s0)

Boundary: the initial stack and the claimed top-of-stack output at the
final row are public inputs.  ``Fibonacci(n)`` is the program ``[ADD2]``.
"""

from __future__ import annotations

import dataclasses

NOOP, SWAP, ADD2 = "noop", "swap", "add2"
OPCODES = (NOOP, SWAP, ADD2)


def run_vm(field, program: list, stack0: tuple, num_rows: int):
    """Execute ``program`` cyclically from ``stack0`` for ``num_rows``
    states; returns the two stack columns (host ints)."""
    if any(op not in OPCODES for op in program):
        raise ValueError(f"unknown opcode in {program}")
    p = field.p
    s0, s1 = int(stack0[0]) % p, int(stack0[1]) % p
    col0, col1 = [s0], [s1]
    for i in range(num_rows - 1):
        op = program[i % len(program)]
        if op == SWAP:
            s0, s1 = s1, s0
        elif op == ADD2:
            s0, s1 = (s0 + s1) % p, s0
        col0.append(s0)
        col1.append(s1)
    return col0, col1


@dataclasses.dataclass
class StackVMPublicInputs:
    s0: int
    s1: int
    output: int  # claimed top of stack at the final row


class StackVMForeign:
    """Foreign AIR surface consumed by :class:`...stark.adapter.AirAdapter`
    (the winterfell-``Air`` role, ``winterfell_adapter/src/adapter/air.rs:30``)."""

    trace_columns = 2
    transition_offsets = [0, 1]
    num_transition_constraints = 2
    end_exemptions = 1
    uses_periodic_values = True

    def __init__(self, program: list, pub_inputs: StackVMPublicInputs,
                 trace_length: int):
        self.program = list(program)
        self.pub = pub_inputs
        self.trace_length = trace_length

    def periodic_values(self):
        """One 0/1 selector column per opcode, period = program length."""
        return [
            [1 if op == want else 0 for op in self.program]
            for want in OPCODES
        ]

    def evaluate_transition(self, rows, periodic):
        (s0, s1), (t0, t1) = rows
        noop, swap, add = periodic
        c0 = noop * (t0 - s0) + swap * (t0 - s1) + add * (t0 - s0 - s1)
        c1 = noop * (t1 - s1) + swap * (t1 - s0) + add * (t1 - s0)
        return [c0, c1]

    def boundary_assertions(self):
        return [
            (0, 0, self.pub.s0),
            (1, 0, self.pub.s1),
            (0, self.trace_length - 1, self.pub.output),
        ]

    def composition_degree_bound(self):
        return 2 * self.trace_length


def prove_program(field, program: list, stack0: tuple, num_rows: int,
                  proof_options=None):
    """Run the VM, wrap the AIR, prove.  Returns
    ``(air_class, proof, pub_inputs)`` — verify with
    :func:`verify_program`."""
    from ..fiat_shamir import DefaultTranscript
    from ..provers.stark import ProofOptions, prove
    from ..provers.stark.adapter import AirAdapter
    from ..provers.stark.trace import TraceTable

    if num_rows % len(program):
        raise ValueError("trace length must be a multiple of the program "
                         "length (selectors are periodic columns)")
    col0, col1 = run_vm(field, program, stack0, num_rows)
    pub = StackVMPublicInputs(s0=col0[0], s1=col1[0], output=col0[-1])
    foreign = StackVMForeign(program, pub, num_rows)
    air_cls = AirAdapter.for_foreign(foreign, field)
    trace = TraceTable.from_columns(field, [col0, col1])
    options = proof_options or ProofOptions.default_test_options()
    proof = prove(air_cls, trace, pub, options, DefaultTranscript(field))
    return air_cls, proof, pub


def verify_program(field, air_cls, proof, pub_inputs, proof_options=None):
    from ..fiat_shamir import DefaultTranscript
    from ..provers.stark import ProofOptions, verify

    options = proof_options or ProofOptions.default_test_options()
    return verify(air_cls, proof, pub_inputs, options,
                  DefaultTranscript(field))


def fibonacci_program():
    """Miden's fib kernel collapses to a single ADD2 per iteration."""
    return [ADD2]


def main():
    from ..fields import Stark252

    field = Stark252
    rows = 32
    air_cls, proof, pub = prove_program(field, fibonacci_program(), (1, 1),
                                        rows)
    ok = verify_program(field, air_cls, proof, pub)
    print(f"fib({rows}) = {pub.output}; proof verifies: {ok}")


if __name__ == "__main__":
    main()
