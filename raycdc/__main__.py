"""CLI entrypoints — the `ray job submit` surface of the engine.

On a cluster::

    ray job submit --working-dir . -- python -m raycdc apply \
        --wal s3://bucket/wal --lake s3://bucket/lake --partitions 4096

Locally the same commands run against `ray.init(address="local")`. This
module owns a Ray session (guarded init); the library and
``__ray_entry__.py`` never call ``ray.init`` themselves.

Subcommands:

- ``apply``    batch replay of all unapplied WAL epochs into the lake
- ``stream``   tail the WAL with the stateful actor engine (per-epoch commits)
- ``compact``  collapse per-partition LSM run sets into single base files
- ``stats``    print manifest/lineage/skew metrics for a lake
- ``export``   write the lake's live view to parquet (optionally as of an
  epoch/version — time travel over retained snapshot manifests)
- ``changes``  write the I/U/D change feed between two committed versions
  (or epochs) to parquet — the incremental-consumer surface
- ``merge``    MERGE INTO the lake from a parquet snapshot (rows carry
  url/warc_ts/seq; ``--delete-col`` marks tombstone rows)
- ``repartition`` re-route the lake to a new url-hash partition count
  (state-preserving; subsequent applies use the new count)
- ``expire``   drop time-travel history (keep the newest N snapshots)
- ``vacuum``   delete data files no retained manifest references
- ``fsck``     validate manifest/file/snapshot consistency (``--deep``
  additionally checks url routing, per-partition uniqueness, sortedness)
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True, include_dashboard=False)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raycdc")
    sub = p.add_subparsers(dest="cmd", required=True)

    ap = sub.add_parser("apply", help="batch replay WAL -> lake")
    ap.add_argument("--wal", required=True)
    ap.add_argument("--lake", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--epochs", type=int, nargs="*", default=None)

    sp = sub.add_parser("stream", help="tail WAL with the actor engine")
    sp.add_argument("--wal", required=True)
    sp.add_argument("--lake", required=True)
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument("--epochs-per-commit", type=int, default=1)

    cp = sub.add_parser("compact", help="compact per-partition run sets")
    cp.add_argument("--lake", required=True)

    st = sub.add_parser("stats", help="print lake metrics")
    st.add_argument("--lake", required=True)

    ex = sub.add_parser("export", help="write the lake view to parquet")
    ex.add_argument("--lake", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--as-of-epoch", type=int, default=None)
    ex.add_argument("--as-of-version", type=int, default=None)

    ch = sub.add_parser("changes", help="write the I/U/D feed to parquet")
    ch.add_argument("--lake", required=True)
    ch.add_argument("--out", required=True)
    ch.add_argument("--from-version", type=int, default=None)
    ch.add_argument("--from-epoch", type=int, default=None)
    ch.add_argument("--to-version", type=int, default=None)
    ch.add_argument("--to-epoch", type=int, default=None)

    mg = sub.add_parser("merge", help="MERGE INTO lake from parquet")
    mg.add_argument("--lake", required=True)
    mg.add_argument("--source", required=True,
                    help="parquet file/dir of rows to upsert")
    mg.add_argument("--partitions", type=int, default=None,
                    help="only for bootstrapping a new lake")
    mg.add_argument("--delete-col", default=None)

    rp = sub.add_parser("repartition",
                        help="re-route the lake to a new partition count")
    rp.add_argument("--lake", required=True)
    rp.add_argument("--partitions", type=int, required=True)

    xp = sub.add_parser("expire", help="drop time-travel history")
    xp.add_argument("--lake", required=True)
    xp.add_argument("--keep-last", type=int, default=2)

    vc = sub.add_parser("vacuum", help="GC unreferenced data files")
    vc.add_argument("--lake", required=True)

    fk = sub.add_parser("fsck", help="validate lake consistency")
    fk.add_argument("--lake", required=True)
    fk.add_argument("--deep", action="store_true")

    args = p.parse_args(argv)
    _ray_init()
    import ray

    try:
        if args.cmd == "apply":
            from raycdc.cdc import apply_changelog

            m = apply_changelog(args.wal, args.lake,
                                num_partitions=args.partitions,
                                epochs=args.epochs)
        elif args.cmd == "stream":
            from raycdc.cdc.actors import CdcEngine

            eng = CdcEngine(args.wal, args.lake,
                            num_partitions=args.partitions)
            m = eng.tail(epochs_per_commit=args.epochs_per_commit)
            eng.shutdown()
        elif args.cmd == "compact":
            from raycdc.cdc import compact_lake

            m = compact_lake(args.lake)
        elif args.cmd == "export":
            from raycdc.cdc import read_lake

            ds = read_lake(args.lake, as_of_epoch=args.as_of_epoch,
                           as_of_version=args.as_of_version)
            ds.write_parquet(args.out)
            # row count from the written footers — metadata only, no
            # second execution of the read pipeline
            import glob
            import pyarrow.parquet as pq

            rows = sum(pq.read_metadata(f).num_rows
                       for f in glob.glob(f"{args.out}/*.parquet"))
            m = {"rows": rows, "out": args.out,
                 "as_of_epoch": args.as_of_epoch,
                 "as_of_version": args.as_of_version}
        elif args.cmd == "changes":
            from raycdc.cdc import lake_changes

            feed = lake_changes(
                args.lake,
                from_version=args.from_version, from_epoch=args.from_epoch,
                to_version=args.to_version, to_epoch=args.to_epoch)
            feed.write_parquet(args.out)
            import glob
            import pyarrow.parquet as pq

            rows = sum(pq.read_metadata(f).num_rows
                       for f in glob.glob(f"{args.out}/*.parquet"))
            m = {"rows": rows, "out": args.out}
        elif args.cmd == "merge":
            from raycdc.cdc import merge_into

            src = ray.data.read_parquet(args.source)
            m = merge_into(args.lake, src,
                           num_partitions=args.partitions,
                           delete_col=args.delete_col)
        elif args.cmd == "repartition":
            from raycdc.cdc import repartition_lake

            m = repartition_lake(args.lake, args.partitions)
        elif args.cmd == "expire":
            from raycdc.cdc import expire_snapshots

            m = {"expired_versions": expire_snapshots(
                args.lake, keep_last=args.keep_last)}
        elif args.cmd == "vacuum":
            from raycdc.cdc import vacuum

            m = {"deleted": vacuum(args.lake)}
        elif args.cmd == "fsck":
            from raycdc.cdc.fsck import check_lake

            m = check_lake(args.lake, deep=args.deep)
            print(json.dumps(m, default=str))
            return 0 if m["ok"] else 1
        else:
            from raycdc.cdc.metrics import lake_stats

            m = lake_stats(args.lake)
        print(json.dumps(m, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
