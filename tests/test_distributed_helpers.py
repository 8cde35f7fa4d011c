"""Multi-host helper functions (single-process behaviors)."""

import jax

from cudadepthmapintegration_tpu.parallel import distributed


def test_initialize_is_noop_on_single_host():
    distributed.initialize()  # must not raise without a coordinator env
    assert not distributed.is_multihost()


def test_host_view_slice_covers_all_views():
    # Single process: the slice is everything.
    assert list(distributed.host_view_slice(7)) == list(range(7))


def test_topology_summary_shape():
    s = distributed.topology_summary()
    assert s["process_count"] == 1
    assert s["global_devices"] == jax.device_count()
    assert s["platform"] == "cpu"
