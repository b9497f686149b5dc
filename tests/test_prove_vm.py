"""Stack-VM execution prover (the prove-miden-class e2e,
``examples/prove-miden/src/main.rs:107``): program -> trace -> foreign AIR
-> adapter -> prove/verify."""

from lambda_elliptic_curves_tpu.examples.prove_vm import (
    ADD2, NOOP, SWAP, StackVMForeign, StackVMPublicInputs,
    fibonacci_program, prove_program, run_vm, verify_program,
)
from lambda_elliptic_curves_tpu.fields import Stark252, U64TestField


def test_vm_executor_semantics():
    f = U64TestField
    c0, c1 = run_vm(f, [SWAP, ADD2, NOOP], (3, 5), 7)
    # row 0: (3,5); SWAP -> (5,3); ADD2 -> (8,5); NOOP -> (8,5);
    # SWAP -> (5,8); ADD2 -> (13,5); NOOP -> (13,5)
    assert c0 == [3, 5, 8, 8, 5, 13, 13]
    assert c1 == [5, 3, 5, 5, 8, 5, 5]


def test_prove_fibonacci_program():
    f = Stark252
    rows = 16
    air_cls, proof, pub = prove_program(f, fibonacci_program(), (1, 1), rows)
    # the fib program computes fib(rows+1) on top of the stack
    fib = [1, 1]
    for _ in range(rows - 1):
        fib.append(fib[-1] + fib[-2])
    assert pub.output == fib[rows]
    assert verify_program(f, air_cls, proof, pub)


def test_prove_mixed_program_all_selectors():
    f = Stark252
    rows = 16
    air_cls, proof, pub = prove_program(f, [SWAP, ADD2, NOOP, ADD2], (2, 7),
                                        rows)
    want0, _ = run_vm(f, [SWAP, ADD2, NOOP, ADD2], (2, 7), rows)
    assert pub.output == want0[-1]
    assert verify_program(f, air_cls, proof, pub)


def test_wrong_claimed_output_rejected():
    f = Stark252
    rows = 16
    program = fibonacci_program()
    air_cls, proof, pub = prove_program(f, program, (1, 1), rows)
    # rebind the adapter against a foreign AIR claiming a wrong output
    from lambda_elliptic_curves_tpu.provers.stark.adapter import AirAdapter

    bad_pub = StackVMPublicInputs(s0=pub.s0, s1=pub.s1,
                                  output=(pub.output + 1) % f.p)
    bad_air = AirAdapter.for_foreign(
        StackVMForeign(program, bad_pub, rows), f)
    assert not verify_program(f, bad_air, proof, bad_pub)
