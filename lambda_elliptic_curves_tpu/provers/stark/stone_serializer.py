"""Stone-prover-compatible proof byte serialization.

Parity: ``StoneCompatibleSerializer`` (``provers/stark/src/proof/stark.rs:73``
and its append_* methods :109-390).  Produces the exact byte layout the
Stone prover (github.com/starkware-libs/stone-prover) emits for a Stark252
proof:

1. trace commitments (main root, then aux root if the AIR has a RAP round)
2. composition polynomial commitment
3. out-of-domain evaluations, trace values column-major over (column,
   offset) then the composition parts:
   t_1(z)..t_1(g^K z) | t_2(z)... | H_1(z^s)..H_s(z^s)
4. FRI inner-layer commitments, then the last-layer value
5. the proof-of-work nonce (8 bytes big-endian), only when grinding was on
6. FRI first layer: the trace openings BT_i for the deduplicated, sorted
   query indexes, the merged trace authentication paths, the composition
   openings BH_i, the merged composition paths
7. FRI inner layers: per layer, the evaluations the verifier cannot derive
   (set Z_i, sorted), then that layer's merged authentication paths

Merged authentication paths (``stark.rs:merge_authentication_paths``) strip
every node the verifier can reconstruct from the openings themselves,
sorted level 0 upward, left to right within a level.

The FRI query indexes are recovered exactly like the reference: by
replaying the verifier's challenge transcript over the proof bytes
(``stark.rs:get_fri_query_indexes``).
"""

from __future__ import annotations

from ...fiat_shamir.stone import StoneProverTranscript
from .domain import Domain
from .extension import ChallengeBundle
from .proof import StarkProof
from .verifier import Verifier


from ...fields.zoo import Stark252

_SER_R = Stark252.params.serialization_r
_P = Stark252.p


def _felt_bytes(value) -> bytes:
    """Stark252 ``AsBytes`` parity: Montgomery-form big-endian bytes."""
    v = value.value if hasattr(value, "value") else int(value)
    return (v * _SER_R % _P).to_bytes(32, "big")


def merge_authentication_paths(paths, leaf_indexes):
    """Minimal node set letting the verifier reach the root for all leaves
    at once (``stark.rs`` merge_authentication_paths parity).

    ``paths``: merkle Proof objects (``merkle_path`` = list of sibling
    digests, leaf level first); ``leaf_indexes``: their leaf positions.
    """
    tree = {}
    for index, path in zip(leaf_indexes, paths):
        node_index = index
        for level, node in enumerate(path.merkle_path):
            tree[(level, node_index ^ 1)] = node
            node_index >>= 1
    result = []
    level_indexes = sorted(set(leaf_indexes))
    height = len(paths[0].merkle_path) if paths else 0
    for level in range(height):
        for node_index in level_indexes:
            sibling = node_index ^ 1
            if sibling not in level_indexes:
                result.append(tree[(level, sibling)])
        level_indexes = sorted({i >> 1 for i in level_indexes})
    return result


def get_fri_query_indexes(air_class, proof: StarkProof, pub_inputs, options,
                          public_input_bytes: bytes):
    """Replay the verifier transcript to recover the query iotas
    (``stark.rs:get_fri_query_indexes``)."""
    air = air_class(proof.trace_length, pub_inputs, options)
    ext = ChallengeBundle(air.field, getattr(air, "extension_degree", 1))
    air.challenge_bundle = ext if ext.degree > 1 else None
    domain = Domain(air)
    transcript = StoneProverTranscript(public_input_bytes)
    challenges = Verifier(air_class)._step_1_replay_rounds(
        air, ext, domain, proof, transcript
    )
    if challenges is None:
        raise ValueError("proof transcript replay failed (invalid proof?)")
    return challenges["iotas"]


def serialize_proof_stone(air_class, proof: StarkProof, pub_inputs, options,
                          public_input_bytes: bytes) -> bytes:
    """``StoneCompatibleSerializer::serialize_proof`` parity."""
    out = bytearray()

    # 1-2: commitments
    out += proof.lde_trace_main_merkle_root
    if proof.lde_trace_aux_merkle_root is not None:
        out += proof.lde_trace_aux_merkle_root
    out += proof.composition_poly_root

    # 3: out-of-domain evaluations, column-major
    height = len(proof.trace_ood_evaluations)        # offsets (frame rows)
    width = len(proof.trace_ood_evaluations[0]) if height else 0
    for i in range(width):
        for j in range(height):
            out += _felt_bytes(proof.trace_ood_evaluations[j][i])
    for v in proof.composition_poly_parts_ood_evaluation:
        out += _felt_bytes(v)

    # 4: FRI commit phase
    for root in proof.fri_layers_merkle_roots:
        out += root
    out += _felt_bytes(proof.fri_last_value)

    # 5: grinding nonce
    if proof.nonce is not None:
        out += int(proof.nonce).to_bytes(8, "big")

    iotas = get_fri_query_indexes(air_class, proof, pub_inputs, options,
                                  public_input_bytes)

    # 6: first layer — deduplicated openings sorted by query index
    seen = set()
    first_layer = []
    for opening, index in zip(proof.deep_poly_openings, iotas):
        if index not in seen:
            seen.add(index)
            first_layer.append((index, opening))
    first_layer.sort(key=lambda pair: pair[0])

    for _, opening in first_layer:
        for v in opening.main_trace_polys.evaluations:
            out += _felt_bytes(v)
        if opening.aux_trace_polys is not None:
            for v in opening.aux_trace_polys.evaluations:
                out += _felt_bytes(v)
        for v in opening.main_trace_polys.evaluations_sym:
            out += _felt_bytes(v)
        if opening.aux_trace_polys is not None:
            for v in opening.aux_trace_polys.evaluations_sym:
                out += _felt_bytes(v)

    trace_indexes = [i for q in iotas for i in (2 * q, 2 * q + 1)]
    main_paths = [p for opening in proof.deep_poly_openings
                  for p in (opening.main_trace_polys.proof,
                            opening.main_trace_polys.proof_sym)]
    for node in merge_authentication_paths(main_paths, trace_indexes):
        out += node

    aux_paths = []
    all_aux = True
    for opening in proof.deep_poly_openings:
        if opening.aux_trace_polys is not None:
            aux_paths.append(opening.aux_trace_polys.proof)
            aux_paths.append(opening.aux_trace_polys.proof_sym)
        else:
            all_aux = False
    if all_aux and aux_paths:
        for node in merge_authentication_paths(aux_paths, trace_indexes):
            out += node

    for _, opening in first_layer:
        for v in opening.composition_poly.evaluations:
            out += _felt_bytes(v)
        for v in opening.composition_poly.evaluations_sym:
            out += _felt_bytes(v)
    comp_paths = [opening.composition_poly.proof
                  for opening in proof.deep_poly_openings]
    for node in merge_authentication_paths(comp_paths, list(iotas)):
        out += node

    # 7: inner layers
    evaluations = {}
    for decommitment, query_index in zip(proof.query_list, iotas):
        layer_index = query_index
        for i, element in enumerate(decommitment.layers_evaluations_sym):
            evaluations[(i, layer_index >> 1, (layer_index + 1) % 2)] = element
            layer_index >>= 1

    indexes_previous_layer = list(iotas)
    num_layers = (len(proof.query_list[0].layers_evaluations_sym)
                  if proof.query_list else 0)
    for i in range(num_layers):
        reconstructed = {(idx >> 1, idx % 2) for idx in indexes_previous_layer}
        needed = {(row, 1 - col) for row, col in reconstructed}
        to_send = sorted(needed - reconstructed)
        for row, col in to_send:
            out += _felt_bytes(evaluations[(i, row, col)])
        indexes_previous_layer = [idx >> 1 for idx in indexes_previous_layer]
        layer_paths = [d.layers_auth_paths[i] for d in proof.query_list]
        for node in merge_authentication_paths(layer_paths,
                                               indexes_previous_layer):
            out += node

    return bytes(out)
