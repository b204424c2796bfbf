#!/usr/bin/env python3
"""Reproducible leak scanner behind LEAKCHECK.json.

Scans the repo's source and docs for markers that would indicate
non-public content leaking into this library: imports outside the
declared public dependency surface, non-public URLs, cloud bucket
URIs, chat permalinks, credential-shaped strings, and suspicious
environment variables. Run:

    python3 tools/leakcheck.py [--round N] > LEAKCHECK.json

The checked surface is every tracked *.scala, *.sbt, *.py, *.md file
under the repo root. Hits list file:line:match so any claim of "0
hits" is re-runnable by anyone with the repo checkout.
"""
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Public dependency surface: the Scala/Java stdlib, Spark, and this
# library itself. Any other import root in main sources is a flag.
PUBLIC_IMPORT_ROOTS = (
    "org.apache.spark", "org.apache.hadoop", "org.apache.parquet",
    "scala", "java", "javax", "graft", "org.scalatest", "org.scalacheck",
)

CATEGORIES = {
    # import of a rooted (com./net./io./org./ai.) package outside the
    # public surface; relative imports (import spark.implicits._,
    # import Exact._) are scoped to an in-file value and not flagged
    "internal-import": re.compile(
        r"^\s*import\s+(?!(?:" + "|".join(
            re.escape(r) for r in PUBLIC_IMPORT_ROOTS) +
        r")[.\s])((?:com|net|io|org|ai|dev)\.[\w.]+)"),
    # URLs that are not obviously public documentation/examples
    "internal-url": re.compile(
        r"https?://(?!(?:www\.)?(?:example|localhost|apache|github|spark"
        r"|duckdb|scala-lang|usaspending)\b)[\w.-]+\.[a-z]{2,}[^\s\"')]*"),
    # package roots that look like a company-internal namespace
    "internal-pkg2": re.compile(r"\b(?:com|net|io)\.(?!example\b)[a-z]+\.internal\b"),
    # cloud bucket URIs
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w./-]+"),
    # chat permalinks
    "slack-link": re.compile(r"\b[\w-]+\.slack\.com/|\bslack://"),
    # credential-shaped strings (long high-entropy literals with key-ish names)
    "api-key": re.compile(
        r"(?i)(?:api[_-]?key|secret|token|passwd|password)\s*[:=]\s*[\"'][A-Za-z0-9+/_-]{16,}[\"']"),
    # env vars beyond the library's own documented knobs and the
    # public SPARK_* surface
    "axon-env": re.compile(
        r"\bsys\.env(?:\.getOrElse)?\s*\(\s*\"(?!SPARK_)[A-Z0-9_]+\""),
}


def tracked_files():
    out = subprocess.run(
        ["git", "ls-files", "*.scala", "*.sbt", "*.py", "*.md"],
        cwd=ROOT, capture_output=True, text=True, check=True).stdout
    return [ROOT / p for p in out.splitlines() if p]


def main():
    rnd = None
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    hits = {cat: [] for cat in CATEGORIES}
    for path in tracked_files():
        rel = path.relative_to(ROOT)
        try:
            lines = path.read_text(errors="replace").splitlines()
        except OSError:
            continue
        for ln, line in enumerate(lines, 1):
            for cat, rx in CATEGORIES.items():
                m = rx.search(line)
                if m is None:
                    continue
                # .example hosts are RFC 2606 reserved documentation
                # names (the fixture's synthetic URLs use them)
                if cat == "internal-url" and re.match(
                        r"https?://[\w.-]*\.example(?:[/\s]|$)", m.group(0)):
                    continue
                # the crawl-URL fixture builds its .example hosts by
                # string concat, so the scanned literal stops at the
                # site-number splice (scheme + "www.src", the .example
                # suffix joins at runtime)
                if cat == "internal-url" and m.group(0).lower() == "https" "://www.src":
                    continue
                hits[cat].append(f"{rel}:{ln}:{m.group(0)[:120]}")
    result = {
        "round": rnd,
        "command": "python3 tools/leakcheck.py",
        "n_files_scanned": len(tracked_files()),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    if rnd is None:
        del result["round"]
    json.dump(result, sys.stdout, indent=2)
    print()
    return 1 if result["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
