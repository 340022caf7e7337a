

def test_steady_state_single_tile_reports_plain_throughput():
    """n_tiles == 1: the one-off and the work are inseparable; the computed
    steady field must fall back to plain throughput instead of dividing by
    a ~0 denominator (r5 review finding)."""
    from memento_tpu.utils import profiling

    profiling.reset_timings()
    with profiling.phase("x.dispatch"):
        pass
    with profiling.phase("x.harvest"):
        import time

        time.sleep(0.01)
    out = profiling.steady_state(2.0, "x", 100)
    assert out["oneoff_s"] == 0.0
    assert out["steady_items_per_s"] == 50.0
