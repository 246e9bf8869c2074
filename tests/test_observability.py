"""ScalarWriter / profile_trace behavior (round-2 verdict minor item:
observability shipped untested)."""

import json
import os

import jax
import jax.numpy as jnp

from stereo_toolbox_tpu.utils.observability import ScalarWriter, profile_trace


def test_scalar_writer_jsonl_mirror(tmp_path):
    w = ScalarWriter(str(tmp_path))
    w.scalars(0, loss=1.5, lr=1e-3)
    w.scalars(1, loss=jnp.asarray(0.75))
    w.flush()
    w.close()

    path = tmp_path / "scalars.jsonl"
    recs = [json.loads(l) for l in path.read_text().splitlines()]
    assert [r["step"] for r in recs] == [0, 1]
    assert recs[0]["loss"] == 1.5 and recs[0]["lr"] == 1e-3
    assert recs[1]["loss"] == 0.75
    assert all("time" in r for r in recs)


def test_scalar_writer_noop_and_reopen(tmp_path):
    # log_dir=None → pure no-op
    w = ScalarWriter(None)
    w.scalars(0, loss=1.0)
    w.flush()
    w.close()

    # append mode: a resumed run extends the same mirror
    for step in (0, 1):
        w = ScalarWriter(str(tmp_path))
        w.scalars(step, loss=float(step))
        w.close()
    recs = (tmp_path / "scalars.jsonl").read_text().splitlines()
    assert len(recs) == 2


def test_profile_trace_writes_trace(tmp_path):
    with profile_trace(str(tmp_path)):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        jax.block_until_ready(x)
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found += [f for f in files if f.endswith((".trace.json.gz", ".pb",
                                                  ".xplane.pb"))]
    assert found, "no profiler artifacts written"


def test_profile_trace_disabled(tmp_path):
    with profile_trace(str(tmp_path), enabled=False):
        pass
    assert not any(os.scandir(tmp_path))
