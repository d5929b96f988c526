

def test_async_save_then_restore(tmp_path):
    """save(block=False) writes in the background; wait_for_saves is the
    barrier; restore sees the complete tree (and itself barriers first)."""
    import numpy as np
    import jax.numpy as jnp

    from meant_tpu.train import checkpoint as ckpt

    tree = {"w": jnp.arange(1024, dtype=jnp.float32).reshape(32, 32),
            "step": 7}
    path = str(tmp_path / "async_ck")
    ckpt.save(path, tree, block=False)
    ckpt.wait_for_saves()
    restored = ckpt.restore(path)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(tree["w"]))
    assert int(restored["step"]) == 7

    # restore without an explicit wait must also see a consistent file
    tree2 = {"w": jnp.ones((16, 16), jnp.float32), "step": 9}
    path2 = str(tmp_path / "async_ck2")
    ckpt.save(path2, tree2, block=False)
    restored2 = ckpt.restore(path2)   # barriers internally
    assert int(restored2["step"]) == 9


def test_async_saves_on_distinct_lanes_overlap_and_complete(tmp_path):
    """Two back-to-back async saves through DIFFERENT lanes both complete
    and restore; wait_for_saves barriers every lane. (Same-lane saves
    serialize inside orbax — lanes exist so the big params write and the
    small opt-state write can overlap, train/classify.py save_model.)"""
    import numpy as np
    import jax.numpy as jnp

    from meant_tpu.train import checkpoint as ckpt

    params = {"w": jnp.arange(4096, dtype=jnp.float32).reshape(64, 64)}
    opt = {"mu": jnp.full((8, 8), 3.0, jnp.float32)}
    p_path = str(tmp_path / "params_ck")
    o_path = str(tmp_path / "opt_ck")
    ckpt.save(p_path, params, block=False, lane="params")
    ckpt.save(o_path, opt, block=False, lane="opt")
    ckpt.wait_for_saves()   # must cover BOTH lanes
    np.testing.assert_array_equal(
        np.asarray(ckpt.restore(p_path)["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(
        np.asarray(ckpt.restore(o_path)["mu"]), np.asarray(opt["mu"]))


def test_restore_barriers_across_lanes(tmp_path):
    """restore() must not read a file an async save on ANY lane is still
    writing — it barriers every lane, not just the default one."""
    import numpy as np
    import jax.numpy as jnp

    from meant_tpu.train import checkpoint as ckpt

    tree = {"w": jnp.ones((128, 128), jnp.float32)}
    path = str(tmp_path / "lane_ck")
    ckpt.save(path, tree, block=False, lane="params")
    restored = ckpt.restore(path)   # no explicit wait_for_saves
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(tree["w"]))
