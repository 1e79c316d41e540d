"""Command-line lifecycle — the reference's ``nft``/``evm`` CLI re-expressed.

    python -m block_crawler_spark crawl  --logs DIR --blocks DIR --silver DIR [--blockchain X]
    python -m block_crawler_spark tail   --logs DIR --blocks DIR --silver DIR [--trail-blocks N] [--once]
    python -m block_crawler_spark verify --logs DIR --silver DIR
    python -m block_crawler_spark seed   --silver DIR --last-block N
    python -m block_crawler_spark reset  --silver DIR
    python -m block_crawler_spark function-digest 'transfer(address,uint256)' [--topic]

Maps to the reference commands (``nft crawl/tail/seed/verify``, ``reset-db``,
``evm function-digest`` — ``evm/bin.py:18-35``).  Bronze inputs are parquet
directories; the live-RPC path constructs a transport and uses
``sources.rpc`` fetch stages instead (see streaming.tail.ChainSource).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from .session import get_spark

    s = get_spark(app)
    s.sparkContext.setLogLevel("ERROR")
    return s


def cmd_crawl(args) -> int:
    from pyspark.sql import functions as F

    from .plans.crawl import crawl_plan
    from .streaming.store import SilverStore

    spark = _spark("crawl")
    logs = spark.read.parquet(args.logs)
    blocks = spark.read.parquet(args.blocks)
    store = SilverStore(spark, args.silver)
    dv, _ = store.get_config(args.blockchain)
    silver = crawl_plan(spark, logs, blocks, blockchain=args.blockchain, data_version=dv)
    store.append_transfers(silver.token_transfers)
    store.upsert_tokens(silver.tokens)
    store.merge_owner_deltas(silver.owner_deltas.withColumn("data_version", F.lit(dv)))
    top = blocks.agg({"number": "max"}).collect()[0][0]
    store.set_config(args.blockchain, dv, top)
    print(json.dumps({"crawled_to": top, "transfers": store.read("token_transfers").count()}))
    return 0


def cmd_tail(args) -> int:
    from .streaming.store import SilverStore
    from .streaming.tail import TableChainSource, TailRunner

    spark = _spark("tail")
    store = SilverStore(spark, args.silver)
    src = TableChainSource(spark.read.parquet(args.logs), spark.read.parquet(args.blocks))
    runner = TailRunner(store, src, blockchain=args.blockchain, trail_blocks=args.trail_blocks,
                        process_interval=args.process_interval)
    n = runner.run(max_batches=1 if args.once else None, sleep=not args.once)
    print(json.dumps({"batches": n, "config": store.get_config(args.blockchain)}))
    return 0


def cmd_verify(args) -> int:
    from .operators.verify import reconcile_balances, reconcile_tokens, reconcile_transfers
    from .streaming.store import SilverStore

    spark = _spark("verify")
    logs = spark.read.parquet(args.logs)
    store = SilverStore(spark, args.silver)
    reports = {
        "transfers": reconcile_transfers(logs, store.read("token_transfers")).count(),
        "tokens": reconcile_tokens(logs, store.read("tokens")).count(),
        "balances": reconcile_balances(logs, store.read("owners")).count(),
    }
    print(json.dumps({"errors": reports, "clean": all(v == 0 for v in reports.values())}))
    return 0 if all(v == 0 for v in reports.values()) else 1


def cmd_seed(args) -> int:
    from .streaming.store import SilverStore
    from .streaming.tail import seed

    store = SilverStore(_spark("seed"), args.silver)
    seed(store, args.blockchain, args.last_block)
    print(json.dumps({"config": store.get_config(args.blockchain)}))
    return 0


def cmd_reset(args) -> int:
    from .streaming.store import SilverStore

    SilverStore(_spark("reset"), args.silver).reset()
    print(json.dumps({"reset": args.silver}))
    return 0


def cmd_function_digest(args) -> int:
    from .functions.keccak import event_topic, function_selector

    out = event_topic(args.signature) if args.topic else function_selector(args.signature)
    print(out)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="block_crawler_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, blocks=True):
        sp.add_argument("--logs", required=True)
        if blocks:
            sp.add_argument("--blocks", required=True)
        sp.add_argument("--silver", required=True)
        sp.add_argument("--blockchain", default="ethereum-mainnet")

    sp = sub.add_parser("crawl"); common(sp); sp.set_defaults(fn=cmd_crawl)
    sp = sub.add_parser("tail"); common(sp)
    sp.add_argument("--trail-blocks", type=int, default=1)
    sp.add_argument("--process-interval", type=float, default=10.0)
    sp.add_argument("--once", action="store_true")
    sp.set_defaults(fn=cmd_tail)
    sp = sub.add_parser("verify"); common(sp, blocks=False); sp.set_defaults(fn=cmd_verify)
    sp = sub.add_parser("seed")
    sp.add_argument("--silver", required=True)
    sp.add_argument("--blockchain", default="ethereum-mainnet")
    sp.add_argument("--last-block", type=int, required=True)
    sp.set_defaults(fn=cmd_seed)
    sp = sub.add_parser("reset")
    sp.add_argument("--silver", required=True)
    sp.set_defaults(fn=cmd_reset)
    sp = sub.add_parser("function-digest")
    sp.add_argument("signature")
    sp.add_argument("--topic", action="store_true", help="emit the 32-byte event topic instead of the 4-byte selector")
    sp.set_defaults(fn=cmd_function_digest)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
