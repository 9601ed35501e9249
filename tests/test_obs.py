import json
import os
import time

from exemplars_vc_tpu.obs import Timer, get_logger, new_run_dir
from exemplars_vc_tpu.obs.scalars import ScalarWriter, read_scalars


def test_timer_measures():
    with Timer("t", sync=False) as t:
        time.sleep(0.05)
    assert 0.04 < t.elapsed < 1.0


def test_timer_sync_fences_device_work():
    """sync=True must cover device EXECUTION of work dispatched inside the
    block, not just its dispatch (effects_barrier never waited for pure
    jitted work)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((1200, 1200))

    def heavy(x):
        for _ in range(60):
            x = x @ x / 1200.0
        return x

    f = jax.jit(heavy)
    f(x).block_until_ready()            # compile outside the timing
    with Timer("t", sync=True) as t_sync:
        f(x)
    with Timer("t", sync=False) as t_async:
        y = f(x)
    y.block_until_ready()
    # the fenced timer must see (most of) the execution the async one skips
    assert t_sync.elapsed > 3 * max(t_async.elapsed, 1e-5), (
        t_sync.elapsed, t_async.elapsed)


def test_get_logger_attaches_file_handler_late(tmp_path):
    """A log_dir passed AFTER the logger was already configured must still
    attach the file handler (and only once per directory)."""
    import logging

    name = "evc_test_late_dir"
    lg = get_logger(name)                       # configured, no file
    n0 = len(lg.handlers)
    lg2 = get_logger(name, log_dir=str(tmp_path))
    assert lg2 is lg
    files = [h for h in lg.handlers if isinstance(h, logging.FileHandler)]
    assert len(files) == 1
    get_logger(name, log_dir=str(tmp_path))     # idempotent per dir
    files = [h for h in lg.handlers if isinstance(h, logging.FileHandler)]
    assert len(files) == 1
    lg.info("hello file")
    files[0].flush()
    logged = open(files[0].baseFilename).read()
    assert "hello file" in logged
    assert len(lg.handlers) == n0 + 1


def test_new_run_dir_increments(tmp_path):
    a = new_run_dir(str(tmp_path))
    b = new_run_dir(str(tmp_path))
    assert os.path.basename(a) == "0" and os.path.basename(b) == "1"


def test_scalar_writer_roundtrip(tmp_path):
    with ScalarWriter(str(tmp_path)) as w:
        w.scalar("loss", 1.5, step=0)
        w.scalar("loss", 1.2, step=1)
        w.summary("weights", [1.0, 2.0, 3.0], step=1)
    events = read_scalars(os.path.join(str(tmp_path), "scalars.jsonl"))
    assert len(events) == 3
    assert events[0]["tag"] == "loss" and events[0]["value"] == 1.5
    assert events[2]["mean"] == 2.0 and events[2]["n"] == 3


def test_get_logger_idempotent(tmp_path):
    lg1 = get_logger("evc_test_logger", log_dir=str(tmp_path))
    lg2 = get_logger("evc_test_logger")
    assert lg1 is lg2
    lg1.info("hello")
    files = os.listdir(str(tmp_path))
    assert len(files) == 1
    assert "hello" in open(os.path.join(str(tmp_path), files[0])).read()


def test_trace_to_writes_profile(tmp_path):
    import jax.numpy as jnp

    from exemplars_vc_tpu.obs import trace_to

    with trace_to(str(tmp_path)):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    # jax profiler writes a plugins/profile/<ts>/ tree
    found = []
    for root, dirs, files in os.walk(str(tmp_path)):
        found.extend(files)
    assert found, "no profiler artifacts written"
