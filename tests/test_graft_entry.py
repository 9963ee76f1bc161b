"""Driver entry points stay green: dryrun_multichip on the 8-device virtual
mesh and entry() tracing (shape-level only; the full compile runs on TPU)."""

import jax


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_traces():
    import __graft_entry__

    fn, (variables, images) = __graft_entry__.entry()
    out = jax.eval_shape(fn, variables, images)
    hms, tags = out
    assert hms[0].shape == (1, 128, 128, 17)
    assert hms[1].shape == (1, 256, 256, 17)
    assert tags.shape == (1, 128, 128, 17)
