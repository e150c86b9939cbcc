

def test_device_batch_witness_update_parity():
    """Device-batched witness update (`accumulator/device_update.py`) must
    match the host polynomial path exactly — additions-only, removals-only
    and mixed batches (reference `batch_utils.rs` Poly_d/v_A/v_D/v_AD)."""
    import os
    import random
    from crypto_tpu.curves import bls12_381 as b
    from crypto_tpu.accumulator.setup import AccumSetupParams, AccumKeypair
    from crypto_tpu.accumulator.core import PositiveAccumulator
    from crypto_tpu.accumulator.persistence import InMemoryState
    from crypto_tpu.accumulator import witness as wit_mod
    from crypto_tpu.accumulator import device_update

    rng = random.Random(5)
    params = AccumSetupParams.new(b"dev-upd")
    kp = AccumKeypair.generate(rng, params)
    acc = PositiveAccumulator.initialize(params)
    state = InMemoryState()
    elems = [b.Fr.rand(rng) for _ in range(20)]
    acc = acc.add_batch(elems, kp.secret_key, state)
    members = elems[:6]
    wits = acc.get_membership_witnesses_for_batch(members, kp.secret_key,
                                                  state)
    additions = [b.Fr.rand(rng) for _ in range(5)]
    removals = elems[10:13]

    for adds, rems in ((additions, []), ([], removals),
                       (additions, removals)):
        host = wit_mod._batch_update_with_sk(
            adds, rems, members, [w.C for w in wits], acc.value(),
            kp.secret_key)
        os.environ["CRYPTO_TPU_FORCE_DEVICE_ACCUM"] = "1"
        try:
            dev = device_update.batch_update_with_sk_device(
                adds, rems, members, [w.C for w in wits], acc.value(),
                kp.secret_key)
        finally:
            del os.environ["CRYPTO_TPU_FORCE_DEVICE_ACCUM"]
        assert [int(a) for a in host[0]] == [int(a) for a in dev[0]], \
            (len(adds), len(rems))
        assert [p.normalize() for p in host[1]] == \
            [p.normalize() for p in dev[1]], (len(adds), len(rems))
