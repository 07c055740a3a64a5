"""Environment smoke tests — the TPU-native equivalent of the reference's
test/test_gpu.py and test/test_transformers.py install checks."""

import jax
import jax.numpy as jnp
import numpy as np


def test_devices_available():
    devs = jax.devices()
    assert len(devs) >= 1
    # under tests this is the virtual CPU mesh; on hardware it's TPU chips
    assert devs[0].platform in ("cpu", "tpu", "axon")


def test_basic_compute():
    x = jnp.ones((128, 128))
    y = jax.jit(lambda a: a @ a)(x)
    np.testing.assert_allclose(np.asarray(y[0, 0]), 128.0)


def test_package_imports():
    import ecg_byte_tpu  # noqa: F401
    from ecg_byte_tpu import models, ops, parallel, tokenizer  # noqa: F401

    assert ecg_byte_tpu.__version__


def test_native_core_builds():
    from ecg_byte_tpu.tokenizer import native

    assert native.native_available()


def test_sharding_machinery():
    from ecg_byte_tpu.parallel import make_mesh

    mesh = make_mesh(dp=len(jax.devices()))
    assert mesh.shape["dp"] == len(jax.devices())


def test_profiling_utilities(tmp_path):
    from ecg_byte_tpu.utils import profiling

    timer = profiling.StepTimer()
    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: (a @ a).sum())
    for _ in range(3):
        with timer.step():
            out = f(x)
            timer.sync(out)
    s = timer.summary()
    assert s["steps"] == 3 and s["mean_s"] > 0

    dt = profiling.log_compile_time(f, x, label="matmul")
    assert dt > 0

    with profiling.trace(str(tmp_path / "trace")):
        f(x).block_until_ready()
    import os
    assert os.path.isdir(tmp_path / "trace")
