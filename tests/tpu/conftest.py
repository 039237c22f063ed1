"""On-chip test lane (VERDICT round 1 §4): real-TPU checks for bug classes
that interpret mode cannot catch (Mosaic miscompiles inside fori_loop bodies,
f32 MXU precision, layout assignment).

Run with:  GBP_ON_TPU=1 python -m pytest tests/tpu -q

Budget ~12 min cold: most of the wall clock is XLA/Mosaic compiles (the
shard_map halo test alone is ~4 min); warm caches cut it to ~6 min.  Run
test_onchip.py::test_halo_cm_on_chip_single_mesh separately if a CI slot
is tight.

Skipped entirely unless a non-CPU jax backend is present (so the normal CPU
suite ignores this directory)."""
import os

import pytest


def pytest_collection_modifyitems(config, items):
    if os.environ.get("GBP_ON_TPU") != "1":
        skip = pytest.mark.skip(reason="on-chip lane: set GBP_ON_TPU=1")
        for item in items:
            if "tests/tpu" in str(item.fspath).replace(os.sep, "/"):
                item.add_marker(skip)
        return
    import jax

    if jax.devices()[0].platform == "cpu":
        skip = pytest.mark.skip(reason="no TPU backend available")
        for item in items:
            if "tests/tpu" in str(item.fspath).replace(os.sep, "/"):
                item.add_marker(skip)
