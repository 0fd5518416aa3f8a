"""CLI — the ``bin/crawl config.py [url]`` analog (reference
setup.py:55-58; ftw/crawler/__init__.py:9-27).

    python -m ftw_crawler_ray crawl  --sf-dir DIR --out DIR
        [--url URL] [--num-shards N] [--checkpoint-dir DIR]
        [--seen-mode exact|cuckoo] [--no-purge] [--num-cpus N]
    python -m ftw_crawler_ray extract --sf-dir DIR --out DIR
    python -m ftw_crawler_ray lineage --checkpoint-dir DIR

A user config file (``--config path/to/config.py`` exposing
``CONFIG = Config(...)``, reference configuration.py:7-28) overrides
the built-in corpus config for the extract fields/sites.

This entry point owns its Ray session (guarded init + shutdown);
library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int):
    """Returns ``(ray, owned)`` — ``owned`` is True only when THIS
    call initialised Ray; a pre-existing session (e.g. a test
    harness's) must not be shut down by the CLI's finally block."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    if owned:
        # never rewrite a borrowed session's shared DataContext
        ray.data.DataContext.get_current().enable_progress_bars = False
    return ray, owned


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ftw-crawler-ray")
    parser.add_argument("--log-dir", default=None, metavar="DIR",
                        help="set up the reference's logging layout "
                             "(console INFO + rotating debug/info/warn "
                             "files) under DIR")
    sub = parser.add_subparsers(dest="command", required=True)

    p_crawl = sub.add_parser("crawl", help="full crawl lifecycle")
    p_crawl.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_crawl.add_argument("--out", required=True)
    p_crawl.add_argument("--url", default=None,
                         help="single-URL mode (reference main.py:117-119)")
    p_crawl.add_argument("--config", default=None,
                         help="python config file exposing CONFIG")
    p_crawl.add_argument("--num-shards", type=int, default=8)
    p_crawl.add_argument("--checkpoint-dir", default=None)
    p_crawl.add_argument("--seen-mode", choices=("exact", "cuckoo"),
                         default="exact")
    p_crawl.add_argument("--no-purge", action="store_true")
    p_crawl.add_argument("--num-cpus", type=int, default=8)
    p_crawl.add_argument("-f", "--force", action="store_true",
                         help="crawl even if documents haven't been "
                              "modified (reference -f/--force)")
    p_crawl.add_argument("--tika", default=None, metavar="TIKA_URL",
                         help="Tika JAXRS base URL: convert non-markup "
                              "content via converters.TikaConverter")
    p_crawl.add_argument("--solr", default=None, metavar="SOLR_URL",
                         help="Solr base URL: POST extracted docs and "
                              "purge deletes after the crawl")
    p_crawl.add_argument("--slacktoken", default=None, metavar="SLACK_TOKEN",
                         help="post crawl failures to Slack (S13)")
    p_crawl.add_argument("--slackchannel", default=None,
                         metavar="SLACK_CHANNEL")

    p_extract = sub.add_parser("extract", help="extraction-only pipeline")
    p_extract.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_extract.add_argument("--out", required=True)
    p_extract.add_argument("--config", default=None)
    p_extract.add_argument("--num-cpus", type=int, default=8)

    p_lineage = sub.add_parser("lineage", help="print shard metrics")
    p_lineage.add_argument("--checkpoint-dir", required=True)

    args = parser.parse_args(argv)

    if args.log_dir:
        from .log import setup_logging

        setup_logging(args.log_dir)

    if args.command == "lineage":
        import glob

        import pyarrow.parquet as pq

        for path in sorted(glob.glob(f"{args.checkpoint_dir}/shard-*.parquet")):
            row = pq.read_table(
                path, columns=["shard_id", "seen_mode", "high_seq", "n_seen",
                               "n_scheduled"]
            ).to_pylist()[0]
            print(json.dumps(row))
        return 0

    ray, _owned = _ray_session(args.num_cpus)
    try:
        config = None
        if args.config:
            from .config import load_config

            config = load_config(args.config)

        if args.command == "crawl":
            from .pipelines.crawl import crawl

            converter = None
            if args.tika:
                from .converters import DispatchConverter, TikaConverter

                converter = DispatchConverter(binary=TikaConverter(args.tika))
            try:
                summary = crawl(
                    args.sf_dir,
                    out_dir=args.out,
                    num_shards=args.num_shards,
                    checkpoint_dir=args.checkpoint_dir,
                    seen_mode=args.seen_mode,
                    single_url=args.url,
                    purge=not args.no_purge,
                    force=args.force,
                    converter=converter,
                    solr_url=args.solr,
                )
            except Exception as ex:
                # reference main.py:83-87: failures notify the Slack
                # channel, then propagate
                if args.slacktoken and args.slackchannel:
                    from .slack import SlackLogger

                    site = (config.sites[0] if config and config.sites
                            else type("S", (), {"url": args.sf_dir})())
                    SlackLogger(args.slacktoken).logError(
                        ex, site, args.slackchannel
                    )
                raise
            print(json.dumps(summary))
        elif args.command == "extract":
            from .pipelines.extract import extract_pipeline

            ds = extract_pipeline(args.sf_dir, config=config)
            ds.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
    finally:
        if _owned:
            ray.shutdown()
    return 0


def crawl_main(argv=None) -> int:
    """The reference's ``crawl config.py [url]`` console script
    (reference setup.py:55-58, __init__.py:9-27): positional config,
    optional single URL, --tika/--solr/--slacktoken/--slackchannel/
    -f — driving the production ``crawl_live`` over real HTTP."""
    parser = argparse.ArgumentParser(prog="crawl")
    parser.add_argument("config", help="Path to the config file")
    parser.add_argument("url", nargs="?", default=None,
                        help="If given, only index the supplied URL")
    parser.add_argument("--tika", help="Base URL to Tika",
                        metavar="TIKA_URL", default=None)
    parser.add_argument("--solr", help="Base URL to Solr",
                        metavar="SOLR_URL", default=None)
    parser.add_argument("--slacktoken", help="Token for Slack messages",
                        default=None)
    parser.add_argument("--slackchannel", help="Channel for Slack messages",
                        default=None)
    parser.add_argument("-f", "--force", action="store_true",
                        help="Force crawling even if documents haven't "
                             "been modified")
    parser.add_argument("--out", default="./crawl-out",
                        help="output directory (docs/plan/index_state)")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--num-shards", type=int, default=4)
    parser.add_argument("--num-cpus", type=int, default=8)
    parser.add_argument("--log-dir", default=None)
    args = parser.parse_args(argv)

    if args.log_dir:
        from .log import setup_logging

        setup_logging(args.log_dir)

    from .config import load_config

    config = load_config(args.config)
    converter = None
    if args.tika:
        from .converters import DispatchConverter, TikaConverter

        converter = DispatchConverter(binary=TikaConverter(args.tika))

    ray, _owned = _ray_session(args.num_cpus)
    try:
        from .pipelines.live import crawl_live

        try:
            summary = crawl_live(
                config.sites,
                args.out,
                config=config,
                converter=converter,
                num_shards=args.num_shards,
                checkpoint_dir=args.checkpoint_dir,
                force=args.force,
                single_url=args.url,
                solr_url=args.solr,
            )
        except Exception as ex:
            # reference main.py:83-87: notify Slack, then propagate
            if args.slacktoken and args.slackchannel:
                from .slack import SlackLogger

                site = (config.sites[0] if config.sites
                        else type("S", (), {"url": "?"})())
                SlackLogger(args.slacktoken).logError(
                    ex, site, args.slackchannel
                )
            raise
        print(json.dumps(summary))
    finally:
        if _owned:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
