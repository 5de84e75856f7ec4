#!/usr/bin/env python3
"""Leak scanner: proves each round's LEAKCHECK.json is a fresh run.

Scans every tracked source/doc file for identifiers that would indicate
non-public provenance: imports outside the public dependency set, URLs to
anything but public OSS hosts, cloud bucket URIs, chat permalinks,
credential-shaped strings, and suspicious environment variables. Emits
LEAKCHECK.json with scan metadata (UTC timestamp, HEAD commit, file count)
so a clean result is evidenced as a re-scan, not a round-number bump.

Run from the repo root: python3 tools/leakcheck.py
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Import roots the build can legitimately reference (build.sbt deps +
# the JDK/stdlib + this repo's own package).
PUBLIC_IMPORT_ROOTS = (
    "org.apache.", "scala.", "scala,", "java.", "javax.", "graft.",
    "org.scalatest", "org.scalacheck", "com.fasterxml.jackson",
    # local SparkSession implicits imports, not package references
    "s.implicits", "spark.implicits", "session.implicits",
)

CHECKS = {
    # Scala imports that resolve outside the declared public deps.
    "internal-import": re.compile(
        r"^\s*import\s+(?!" + "|".join(
            re.escape(p) for p in PUBLIC_IMPORT_ROOTS) + r")[a-z][\w.]*",
        re.M),
    # URLs to anything but public OSS/doc hosts.
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|(?:[\w-]+\.)*(?:apache\.org|"
        r"github\.com|githubusercontent\.com|kernelci\.org|spark\.apache\.org|"
        r"arxiv\.org|acm\.org|wikipedia\.org|duckdb\.org|scala-lang\.org|"
        r"scalatest\.org|json-schema\.org|example\.(?:com|org|net)|"
        r"w3\.org))[\w.-]+"),
    # Private-package smells in artifact coordinates or FQCNs.
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?:corp|internal|private)[\w.]*"),
    # Cloud storage URIs — none should appear in a self-contained repo.
    "internal-bucket": re.compile(r"\b(?:gs|s3a?|abfss?|wasbs?)://[\w./-]+"),
    # Chat-workspace permalinks.
    "slack-link": re.compile(r"\b[\w-]+\.slack\.com/\S+|slack://\S+"),
    # Credential-shaped strings (OpenAI/Anthropic-style keys, AWS key ids,
    # Google API keys, GitHub tokens).
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9-]{20,}|AKIA[0-9A-Z]{16}|AIza[\w-]{35}|"
        r"gh[pousr]_[A-Za-z0-9]{36,})\b"),
    # Environment variables beyond the documented public surface.
    "axon-env": re.compile(
        r"""(?:sys\.env\(|getenv\(|System\.getenv\()\s*["']"""
        r"""(?!SPARK_GRAFT_|SPARK_|JAVA_|HOME|PATH|TMPDIR|USER)[A-Z_]+"""),
}

SCAN_SUFFIXES = {".scala", ".sbt", ".py", ".md", ".json", ".sh", ".conf"}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, check=True,
                         capture_output=True, text=True).stdout
    for rel in out.splitlines():
        p = ROOT / rel
        # the scanner's own pattern definitions are not leaks
        if (p.suffix in SCAN_SUFFIXES and p.is_file()
                and p.name != "LEAKCHECK.json"
                and rel != "tools/leakcheck.py"):
            yield rel, p


def main():
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in CHECKS}
    n_files = 0
    for rel, p in tracked_files():
        n_files += 1
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for name, rx in CHECKS.items():
            # the import check is Scala-specific; Python files import
            # stdlib/driver-side modules legitimately (oracle_check.py)
            if name == "internal-import" and p.suffix not in (".scala", ".sbt"):
                continue
            for m in rx.finditer(text):
                # SparkSession implicits imports come through local vals
                # of arbitrary name (s/ds.sparkSession/...): not packages.
                if name == "internal-import" and "implicits" in m.group(0):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{rel}:{line}:{m.group(0)[:120]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT, check=True,
                          capture_output=True, text=True).stdout.strip()
    result = {
        "round": round_no,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "scan": {
            "timestamp_utc": datetime.now(timezone.utc).isoformat(
                timespec="seconds"),
            "commit": head,
            "files_scanned": n_files,
            "tool": "tools/leakcheck.py",
        },
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps({"n_hits": result["n_hits"], "files": n_files,
                      "commit": head[:12]}))
    return 0 if result["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
