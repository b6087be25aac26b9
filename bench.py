#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: one Ray session at ``RAY_GRAFT_CPUS`` (default 32) running
  1. the HEADLINE pipeline — the north-rule spatial-join + tiling chain
     over a deterministic synthetic page table (parquet on /tmp, generated
     once and reused): read → geocode → cell assign → broadcast PiP join
     (10k AOI polygons) → 256×256 tile assign → partitioned parquet write;
     metric = wall seconds (plus pages/sec),
  2. every oracle-checked query from ``buteo_ray.pipelines.queries`` over
     ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).
Prints ONE JSON line.

``--scaling``: runs the headline pipeline in two FRESH processes at 8 and
32 CPUs (same input) and prints throughput at both + scaling efficiency
(the sandbox stand-in for the N vs 4N-node cluster criterion — see
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "1000000"))
NUM_AOI = int(os.environ.get("GRAFT_BENCH_AOI", "10000"))
PAGES_DIR = f"/tmp/buteo_ray_bench/pages_{N_PAGES}"
# Output goes to tmpfs: on one box a 4-GB parquet write is disk-bandwidth
# bound and would mask CPU scaling; a real cluster writes N-ways parallel.
OUT_DIR = "/dev/shm/buteo_ray_bench/headline_out"


def bandwidth_probe() -> float:
    """Single-thread 23M-element gather, seconds. This box's memory
    bandwidth oscillates on minute timescales (healthy ≈0.5 s, degraded
    2-10 s) and a degraded window can inflate every number 5-10× —
    recording the probe beside each measurement makes its validity
    auditable (see BASELINE.md sessions A-K)."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random(23_000_000)
    idx = rng.integers(0, a.size, a.size)
    t0 = time.perf_counter()
    a[idx]
    return round(time.perf_counter() - t0, 2)


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _ensure_pages():
    """Generate the deterministic page table once (not part of the timed
    pipeline — the north rule's input is a parquet table on storage).

    A ``_SUCCESS`` marker written AFTER the parquet files gates reuse: a
    run killed mid-write leaves a partial directory, and silently
    benching against it would inflate pages_per_sec (the numerator stays
    N_PAGES) and invalidate the scaling numbers."""
    marker = os.path.join(PAGES_DIR, "_SUCCESS")
    if os.path.exists(marker):
        return
    import shutil

    from buteo_ray.sources.pages import pages_dataset

    shutil.rmtree(PAGES_DIR, ignore_errors=True)  # sweep partial leftovers
    os.makedirs(PAGES_DIR, exist_ok=True)
    # ≥2 blocks per CPU at the 32-CPU level so no stage starves.
    blocks = max(64, N_PAGES // 100_000)
    pages_dataset(N_PAGES, override_num_blocks=blocks).write_parquet(PAGES_DIR)
    with open(marker, "w") as f:
        f.write(str(N_PAGES))


def run_headline() -> dict:
    import ray.data as rd

    from buteo_ray.sources.aoi import synth_aoi_polygons
    from buteo_ray.stages.cell_assign import assign_cells
    from buteo_ray.stages.geocode import geocode
    from buteo_ray.stages.join import broadcast_pip_join
    from buteo_ray.stages.tiling import GridSpec, assign_tiles

    _ensure_pages()
    shutil.rmtree(OUT_DIR, ignore_errors=True)

    aoi = synth_aoi_polygons(NUM_AOI)

    def chain():
        ds = rd.read_parquet(PAGES_DIR, columns=["url", "warc_ts", "text", "lang", "page_id"])
        ds = geocode(ds, id_col="page_id")
        ds = assign_cells(ds, resolutions=(5, 7, 9, 12))
        ds = broadcast_pip_join(ds, aoi, how="inner", exact=True)
        ds = assign_tiles(ds, GridSpec.global_grid(10))
        return ds

    # Untimed warm-up: OS page cache, Ray worker startup, parquet metadata.
    # Reusing the same (lazy) Dataset keeps the metadata fetch out of the
    # timed region; the transforms re-execute in full on write.
    ds = chain()
    ds.count()

    t0 = time.perf_counter()
    ds.write_parquet(OUT_DIR)
    sec = time.perf_counter() - t0
    if "--stats" in sys.argv:
        # Per-stage executor breakdown (ds.stats() of the timed run) —
        # the iterate-until-wall-time-is-useful-compute feedback loop.
        print(ds.stats(), file=sys.stderr)
    # Don't leave multi-GB output resident in tmpfs after the bench.
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    return {"sec": sec, "pages": N_PAGES, "pages_per_sec": N_PAGES / sec}


PARTIAL_PATH = os.environ.get("GRAFT_BENCH_PARTIAL",
                              "/tmp/buteo_ray_bench/partial.json")


def _flush_partial(payload: dict):
    """Persist the in-progress result after every step: a mid-loop
    raylet crash or truncated stdout (the r03/r04 artifact failures)
    then still leaves a complete-as-of-the-crash JSON file on disk."""
    try:
        d = os.path.dirname(PARTIAL_PATH)
        if d:  # a bare filename means cwd — makedirs('') would raise
            os.makedirs(d, exist_ok=True)
        tmp = PARTIAL_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, PARTIAL_PATH)
    except OSError:
        pass  # a full disk must not kill the bench


def _ensure_ray_alive(ray):
    """Revive the local cluster if a query crashed it (degraded-host
    raylet deaths killed two rounds' artifacts)."""
    try:
        if ray.is_initialized():
            ray.cluster_resources()  # raises if the GCS/raylet died
            return
    except Exception:
        try:
            ray.shutdown()
        except Exception:
            pass
    _init_ray(NUM_CPUS)


def run_queries(ray, payload: dict) -> dict:
    """Per-query try/except: one query hitting a host-degradation raylet
    death must cost ONE {"err": ...} entry, never the whole artifact."""
    from buteo_ray.pipelines.queries import QUERIES

    import ray.data

    times = payload.setdefault("queries", {})
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        try:
            t0 = time.perf_counter()
            out = fn(SF_DIR)
            if isinstance(out, ray.data.Dataset):
                out.count()  # force execution of lazy pipelines
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record, revive, continue
            times[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            _ensure_ray_alive(ray)
        _flush_partial(payload)
    return times


def main():
    probe_before = bandwidth_probe()
    ray = _init_ray(NUM_CPUS)
    payload = {
        "metric": "spatial-join+tiling headline seconds (pages/sec in extras)",
        "value": None,
        "unit": "sec",
        "queries": {},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": N_PAGES,
        "pages_per_sec": None,
    }
    try:
        headline = run_headline()
        payload["value"] = round(headline["sec"], 3)
        payload["pages"] = headline["pages"]
        payload["pages_per_sec"] = round(headline["pages_per_sec"], 1)
    except Exception as e:  # noqa: BLE001 — keep the query loop alive
        payload["headline_err"] = f"{type(e).__name__}: {e}"[:300]
        _ensure_ray_alive(ray)
    _flush_partial(payload)
    if os.environ.get("GRAFT_BENCH_MODE", "full") == "full":
        run_queries(ray, payload)
    try:
        ray.shutdown()
    except Exception:
        pass
    # Host-health context: healthy ≈0.5 s; >1 s means this run landed
    # in a degraded window and its times are NOT comparable.
    payload["bandwidth_probe_sec"] = [probe_before, bandwidth_probe()]
    _flush_partial(payload)
    # Compact separators keep the line as short as possible (an r03
    # artifact was lost to one-line truncation), printed LAST and flushed.
    print(json.dumps(payload, separators=(",", ":")), flush=True)


def scaling():
    scaling_pages = os.environ.get("GRAFT_SCALING_PAGES", "16000000")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_MODE="headline",
                   GRAFT_BENCH_PAGES=scaling_pages)
        # One retry per level: a degraded-host raylet death in a single
        # subprocess must cost one rerun, not the whole scaling artifact.
        for attempt in (0, 1):
            p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True)
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and lines:
                try:  # rc=0 with a truncated line must consume the retry
                    d = json.loads(lines[-1])
                except ValueError:
                    d = {}
                if d.get("value") is not None:
                    return d
            if attempt == 0:
                print(f"scaling subprocess at {ncpu} CPUs failed "
                      f"(rc={p.returncode}); retrying", file=sys.stderr)
        raise RuntimeError(
            f"scaling run at {ncpu} CPUs failed twice: {p.stderr[-300:]}")

    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    # Generate input once (outside both timed runs).
    global N_PAGES, PAGES_DIR
    N_PAGES = int(scaling_pages)
    PAGES_DIR = f"/tmp/buteo_ray_bench/pages_{N_PAGES}"
    ray = _init_ray(16)
    _ensure_pages()
    ray.shutdown()
    # Best-of-3 per level: single-box runs suffer interference (page
    # cache, leftover workers); the fastest run is closest to capability.
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    probe_before = bandwidth_probe()
    runs_lo = [run(lo) for _ in range(reps)]
    probe_mid = bandwidth_probe()
    runs_hi = [run(hi) for _ in range(reps)]
    probe_after = bandwidth_probe()
    r_lo = max(runs_lo, key=lambda r: r["pages_per_sec"])
    r_hi = max(runs_hi, key=lambda r: r["pages_per_sec"])
    tput_lo = r_lo["pages_per_sec"]
    tput_hi = r_hi["pages_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(json.dumps({
        "metric": f"scaling efficiency ({lo} -> {hi} CPUs, same input)",
        "pages": r_lo["pages"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "pages_per_sec_lo": tput_lo,
        "pages_per_sec_hi": tput_hi,
        "scaling_efficiency": round(eff, 3),
        "all_runs_lo": [r["value"] for r in runs_lo],
        "all_runs_hi": [r["value"] for r in runs_hi],
        "bandwidth_probe_sec": [probe_before, probe_mid, probe_after],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
