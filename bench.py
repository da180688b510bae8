#!/usr/bin/env python
"""Benchmark harness: headline CDC-apply throughput + per-pipeline timings.

Default: runs over $GRAFT_SF_DIR (default /root/testdata/sf0.1) with
ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON
line: {"metric": ..., "value": seconds, "unit": "sec", "queries": {...},
"sf": ..., "num_cpus": N, "cdc_events_per_sec": ...}.

--scaling: runs the headline job at 2 and 8 CPUs in FRESH processes on the
same input, N times (RAYCDC_SCALING_RUNS, default 3), each pair loadavg-gated,
and prints one JSON artifact with every run's throughputs plus the MEDIAN
efficiency eff = (throughput_8 / throughput_2) / 4 — the sandbox substitute
for the north rule's N vs 4N cluster criterion (see BASELINE.md). One 32-CPU
leg is appended for the 8->32 (bandwidth-ceiling) context.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CDC_EVENTS = int(os.environ.get("RAYCDC_BENCH_EVENTS", "10000000"))
CDC_PARTITIONS = int(os.environ.get("RAYCDC_BENCH_PARTITIONS", "32"))


def wait_for_idle(bar: float = 2.5, max_wait: int = 150) -> float:
    """Bounded wait for the 1-min loadavg to decay below ``bar``.

    This box is shared: external load inflates EVERY timing uniformly
    (observed ~1.7-2x at loadavg 5+, BASELINE.md methodology). Gating the
    recorded artifact on an idle start keeps one contended run from
    becoming the round's official number. Bounded so a persistently busy
    box still produces output (the loadavg fields flag the contention).
    """
    waited = 0.0
    while os.getloadavg()[0] > bar and waited < max_wait:
        time.sleep(10)
        waited += 10
    return os.getloadavg()[0]


def host_probe() -> float:
    """Single-thread fixed-work CPU probe (seconds; lower = healthier).

    The host has EPISODIC multi-minute slowdown windows INVISIBLE to
    loadavg (whole benches uniformly 2-4x slower at loadavg < 0.5 —
    likely hypervisor clock throttling; BASELINE.md methodology), so the
    artifact records absolute single-core speed at start: compare probes
    across runs before comparing query times. np.sort is single-threaded
    in numpy regardless of the BLAS pool, so the number is comparable
    across processes and hosts."""
    import numpy as np
    a = np.random.default_rng(7).random(8_000_000)
    t0 = time.perf_counter()
    for _ in range(3):
        np.sort(a, kind="stable")
    return round(time.perf_counter() - t0, 3)


def consume(ds) -> int:
    # batch_size=None yields whole blocks: the default (1024-row re-slicing
    # on one driver thread) costs ~1.5s per million rows and was inflating
    # every per-query number (measured: 14.7s -> 0.05s consuming a 10M-row
    # materialized dataset).
    if not hasattr(ds, "iter_batches"):
        return ds.num_rows  # point-lookup queries return a plain Arrow table
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        n += b.num_rows
    return n


def run_bench() -> dict:
    import ray
    from ray.data import DataContext

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             logging_config=ray.LoggingConfig(log_level="ERROR"))

    # The events fixture's map-typed `props` column trips Ray's schema-dedup
    # hashing ("Failed to hash the schemas ... unhashable type: 'dict'",
    # transform_pyarrow.py). Harmless but floods the log and buries real
    # warnings; the LoggingConfig above silences workers, this silences the
    # driver-side module logger.
    import logging

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow").setLevel(
        logging.ERROR)
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    if num_cpus >= 24:
        # Leave scheduler/object-store headroom on big hosts: a pipeline
        # allowed to occupy every advertised CPU contends with the raylet and
        # object store and runs measurably slower (observed 8.3s -> 7.1s at
        # 32 CPUs with a cap of 24 on the 10M-event replay).
        from ray.data._internal.execution.interfaces import ExecutionResources

        ctx.execution_options.resource_limits = ExecutionResources(
            cpu=int(num_cpus * 0.75))

    import __ray_entry__ as entrymod
    from raycdc.cdc import apply_changelog, generate_changelog
    from raycdc.cdc.changelog import ChangelogSpec

    # --- headline: CDC replay (generation is cached + untimed; one warm
    # read of the wal primes the page cache so we measure compute+shuffle)
    # 32 segments: file-level read parallelism for the scan stage
    spec = ChangelogSpec(num_events=CDC_EVENTS,
                         num_urls=max(1000, CDC_EVENTS // 20),
                         num_epochs=32, seed=42)
    # cache key includes the row-group size: segment layout changes the read
    # parallelism, so a wal written under an old layout must not be reused
    wal = (f"/tmp/raycdc/bench-wal-{CDC_EVENTS}x{spec.num_epochs}"
           f"rg{spec.row_group_size}")
    generate_changelog(wal, spec)
    for f in sorted(os.listdir(wal)):
        if f.endswith(".parquet"):
            with open(os.path.join(wal, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    # one untimed warm-up replay (worker pool startup, page cache), then the
    # timed runs — report the best of two
    import shutil

    def one_apply(tag: str) -> float:
        lake = f"/tmp/raycdc/bench-lake-{CDC_EVENTS}-{os.getpid()}-{tag}"
        t0 = time.perf_counter()
        m = apply_changelog(wal, lake, num_partitions=CDC_PARTITIONS)
        dt = time.perf_counter() - t0
        shutil.rmtree(lake, ignore_errors=True)
        assert m["events"] == CDC_EVENTS
        return dt

    # loadavg-gate the recorded artifact: wait (bounded) for external load
    # to drain before the timed runs; the warmup overlaps part of the decay.
    # Headline-only (scaling) legs skip the gate — run_scaling gates once
    # per PAIR so back-to-back legs don't each stall on the other's wake.
    if os.environ.get("RAYCDC_BENCH_HEADLINE_ONLY"):
        load_at_start = os.getloadavg()[0]
    else:
        load_at_start = wait_for_idle()
    probe_at_start = host_probe()
    one_apply("warmup")
    t1, t2, t3 = one_apply("t1"), one_apply("t2"), one_apply("t3")
    headline = min(t1, t2, t3)
    if max(t1, t2, t3) > 1.3 * headline:
        # the runs disagree wildly — bursty external load / an episodic
        # hypervisor slowdown window; one more sample protects the headline
        headline = min(headline, one_apply("t4"))
    if os.environ.get("RAYCDC_BENCH_HEADLINE_ONLY"):
        # scaling mode: the efficiency RATIO compounds noise from both
        # legs — five timed runs per level converge each leg to its best
        headline = min(headline, one_apply("t5"), one_apply("t6"))
    eps = CDC_EVENTS / headline if headline > 0 else 0.0
    metrics = {"events": CDC_EVENTS}

    # --- streaming engine (actor/LSM path) over the same WAL family but a
    # smaller slice: the per-epoch commit cadence is the point of this path,
    # so it pays pipeline spin-up once per commit batch by design.
    stream_events = int(os.environ.get("RAYCDC_BENCH_STREAM_EVENTS", "2000000"))
    stream_stats = None
    if stream_events and not os.environ.get("RAYCDC_BENCH_HEADLINE_ONLY"):
        from raycdc.cdc.actors import CdcEngine

        sspec = ChangelogSpec(num_events=stream_events,
                              num_urls=max(1000, stream_events // 20),
                              num_epochs=32, seed=42)
        swal = (f"/tmp/raycdc/bench-wal-{stream_events}x{sspec.num_epochs}"
                f"rg{sspec.row_group_size}")
        generate_changelog(swal, sspec)
        slake = f"/tmp/raycdc/bench-stream-lake-{os.getpid()}"
        eng = CdcEngine(swal, slake, num_partitions=16)
        epochs_per_commit = 4
        t0 = time.perf_counter()
        m = eng.tail(epochs_per_commit=epochs_per_commit)
        dt = time.perf_counter() - t0
        eng.shutdown()
        shutil.rmtree(slake, ignore_errors=True)
        assert m["events"] == stream_events
        stream_stats = {"seconds": round(dt, 3), "events": stream_events,
                        "commits": -(-sspec.num_epochs // epochs_per_commit),
                        "events_per_sec": round(stream_events / dt, 1)}

    # --- per-pipeline timings over the sf dir
    if os.environ.get("RAYCDC_BENCH_HEADLINE_ONLY"):
        out = {
            "metric": "cdc_apply_seconds",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {"cdc_replay": round(headline, 3)},
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "cdc_events": metrics["events"],
            "cdc_events_per_sec": round(eps, 1),
            "loadavg_1m_start": round(load_at_start, 2),
            "host_probe_sec_start": probe_at_start,
        }
        ray.shutdown()
        return out

    queries = entrymod.queries()
    bench_set = [
        "flatten_tree", "flatten_dag", "agg_lineitem", "join_orders_lineitem",
        "join_customer_region", "lww_events", "dedup_exact", "token_count",
        "ann_topk", "quality", "langid", "minhash_pairs", "record_flatten",
        "window_tumbling", "explode_embeddings", "simhash_pairs",
        "window_session", "join_asof", "join_interval", "topk_lineitems",
        "embed_dup_pairs", "curation_pipeline", "window_funcs",
        "grouped_quantiles", "rollup_lineitem", "sample_events", "redact_pii",
        "stratified_sample_events", "approx_quantile_value",
        "pivot_lineitem", "curation_pipeline_v2", "cube_lineitem",
        "except_events", "intersect_events", "unpivot_lineitem",
        "tokenize_docs", "window_rank", "count_distinct_users",
        "approx_distinct_by_type", "join_full_outer", "join_semi_bloom",
        "grouped_quantiles_sketch", "mode_event_type", "argmax_event",
        "window_rolling",
        "string_agg_docs",
        "global_sort_events", "global_sort_docs", "ordered_lake",
        "repetition_stats",
        "chunk_docs", "quality_filter_median", "mixture_by_source",
        "decontaminate_docs", "top_bigrams", "curation_pipeline_v3",
        "near_dedup_docs", "dedup_incremental", "embed_dedup_ids",
        "dup_passages", "scrub_passages", "curation_pipeline_v4",
        "host_stats", "rare_token_filter", "crawl_diff",
        "top_docs_per_source", "quantile_buckets", "weighted_sample_docs",
        "cdc_time_travel", "cdc_changes",
        "incremental_view", "copartition_join", "cdc_schema_evolution",
        "merge_upsert", "lake_lookup",
        "canon_urls", "c4_filter_docs", "curation_pipeline_v5",
        "gopher_stats", "gopher_filter_docs", "ngram_fluency",
        "host_cap_docs", "incremental_minmax_view", "tfidf_keywords",
        "zorder_events", "ordered_join", "lake_maintenance",
    ]
    # Two passes, per-query MIN: this box has episodic multi-minute
    # slowdown windows (measured 2026-08-17: the same query set ran
    # uniformly 2-4x slower in one full pass than in the previous one,
    # while a 24-way CPU spin stayed at 23.4/24 parallelism and dd write
    # throughput swung 89->493 MB/s — hypervisor-side, not load-visible,
    # loadavg at start was 0.4). A single-shot per-query number recorded
    # inside such a window misstates the engine by the same factor; the
    # min of two passes ~10 minutes apart survives one episode.
    passes = int(os.environ.get("RAYCDC_BENCH_QUERY_PASSES", "2"))
    q_times: dict[str, float] = {}
    for _ in range(passes):
        for name in bench_set:
            t0 = time.perf_counter()
            consume(queries[name](sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            q_times[name] = min(q_times.get(name, dt), dt)
    q_times["cdc_replay"] = round(headline, 3)
    if stream_stats:
        q_times["cdc_stream"] = stream_stats["seconds"]

    out = {
        "metric": "cdc_apply_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "cdc_events": metrics["events"],
        "cdc_events_per_sec": round(eps, 1),
        # contention context: this box is shared — a high loadavg relative
        # to the bench's own footprint means external load was competing
        # and every number above is uniformly inflated (observed uniform
        # ~1.7-2x on ALL queries under loadavg ≈ 5+; BASELINE.md notes).
        # start is gated (wait_for_idle), end includes the bench's own load.
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "loadavg_1m_start": round(load_at_start, 2),
        # absolute single-core speed at start/end (see host_probe): the
        # episodic hypervisor throttle is invisible to loadavg — compare
        # probe values across artifacts before comparing query times
        "host_probe_sec_start": probe_at_start,
        "host_probe_sec_end": host_probe(),
    }
    if stream_stats:
        out["cdc_stream"] = stream_stats
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Median-of-N scaling artifact (round-2 VERDICT item 8).

    Headline pair = N=2 -> 4N=8 CPUs: on a single box, the pair must sit
    below the shared-memory-bandwidth ceiling (~16 cores for this
    shuffle-heavy job) to say anything about multi-node scaling, where each
    added node brings its own bandwidth and object store. Each pair run is
    loadavg-gated at the start (bounded wait for external load to drain),
    every run's raw throughputs are recorded, and the headline value is the
    MEDIAN efficiency across runs — one machine-readable record replaces
    the hand-maintained eight-run table in BASELINE.md. A pooled best-of
    estimator (best 8-CPU leg / best 2-CPU leg / 4) is also reported:
    contention on this box is strictly one-sided (it only slows runs), so
    best-of legs are the cleanest per-leg throughput estimates. One 32-CPU
    leg gives the 8->32 context (bandwidth-ceiling bound, see BASELINE.md).
    """
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAYCDC_BENCH_HEADLINE_ONLY="1")
        res = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(res.stdout.strip().splitlines()[-1])

    n_runs = int(os.environ.get("RAYCDC_SCALING_RUNS", "3"))
    runs = []
    for i in range(n_runs):
        load0 = wait_for_idle()
        r2, r8 = one(2), one(8)
        eff = (r8["cdc_events_per_sec"] / r2["cdc_events_per_sec"]) / 4 \
            if r2["cdc_events_per_sec"] else 0.0
        runs.append({
            "run": i + 1,
            "eff_2cpu_to_8cpu": round(eff, 3),
            "events_per_sec": {"2cpu": r2["cdc_events_per_sec"],
                               "8cpu": r8["cdc_events_per_sec"]},
            "sec": {"2cpu": r2["value"], "8cpu": r8["value"]},
            "loadavg_1m_start": round(load0, 2),
            # per-leg single-core speed (host_probe): a pair whose two legs
            # show very different probes straddled a throttle transition
            # and its efficiency is not leg-comparable
            "host_probe_sec": {"2cpu": r2.get("host_probe_sec_start"),
                               "8cpu": r8.get("host_probe_sec_start")},
        })
    effs = sorted(r["eff_2cpu_to_8cpu"] for r in runs)
    mid = len(effs) // 2
    median_eff = effs[mid] if len(effs) % 2 else \
        round((effs[mid - 1] + effs[mid]) / 2, 3)
    best2 = max(r["events_per_sec"]["2cpu"] for r in runs)
    best8 = max(r["events_per_sec"]["8cpu"] for r in runs)
    pooled_eff = round((best8 / best2) / 4, 3) if best2 else 0.0

    wait_for_idle()
    r32 = one(32)
    eff_8_32 = round((r32["cdc_events_per_sec"] / best8) / 4, 3) \
        if best8 else 0.0

    return {
        "metric": "cdc_scaling_efficiency",
        "value": median_eff,
        "unit": "ratio",
        "pair": "2cpu->8cpu",
        "estimator": f"median of {n_runs} loadavg-gated pair runs",
        "eff_2cpu_to_8cpu_median": median_eff,
        "eff_2cpu_to_8cpu_pooled_best": pooled_eff,
        "eff_8cpu_to_32cpu": eff_8_32,
        "runs": runs,
        "events_per_sec_32cpu": r32["cdc_events_per_sec"],
        "sec_32cpu": r32["value"],
        "host_probe_sec_32cpu": r32.get("host_probe_sec_start"),
        "cdc_events": r32["cdc_events"],
        "loadavg_1m_end": round(os.getloadavg()[0], 2),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
