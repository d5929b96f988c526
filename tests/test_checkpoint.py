

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
