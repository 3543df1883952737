#!/usr/bin/env python3
"""Builder-side leak scan with run provenance.

Complements the per-round LEAKCHECK artifact: embeds the scanned commit
SHA and file count so a fresh scan is distinguishable from a stale round
bump. Scans every tracked source/doc file for imports outside the public
dependency surface, non-public URLs, cloud bucket references, chat/share
links, and credential-shaped strings.

Usage: python3 tools/leakscan.py  (writes tools/leakscan_result.json)
"""
import json, re, subprocess, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALLOWED_IMPORT = re.compile(
    r"^import\s+(org\.apache\.|scala\.|java\.|javax\.|graft\.|org\.scalatest|"
    r"org\.scalacheck|com\.github\.luben|org\.xerial|net\.jpountz|org\.slf4j|"
    r"org\.roaringbitmap|s\.implicits|spark\.implicits)")  # last two: local SparkSession values
IMPORT = re.compile(r"^import\s+[a-zA-Z]")
URL = re.compile(r"https?://[\w.\-/]+")
ALLOWED_URL = re.compile(
    r"https?://(www\.)?(github\.com|apache\.org|spark\.apache\.org|arxiv\.org|"
    r"duckdb\.org|scala-lang\.org|localhost|127\.0\.0\.1|en\.wikipedia\.org)")
BUCKET = re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[\w.\-]+")
CHAT_LINK = re.compile(r"slack\.com|go/[a-z][\w\-]+\b")
KEYLIKE = re.compile(r"\b(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{30,})\b")

def main():
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    files = subprocess.run(["git", "ls-files"], cwd=ROOT,
                           capture_output=True, text=True).stdout.split()
    scan = [f for f in files if f.endswith((".scala", ".sbt", ".py", ".md", ".json"))
            and not f.startswith("tools/leakscan_result")]
    hits = {"foreign-import": [], "non-public-url": [], "bucket": [],
            "chat-link": [], "credential": []}
    for f in scan:
        try:
            text = open(os.path.join(ROOT, f), encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            ls = line.strip()
            if f.endswith((".scala", ".sbt")) and IMPORT.match(ls) and not ALLOWED_IMPORT.match(ls):
                hits["foreign-import"].append(f"{f}:{i}: {ls[:120]}")
            for m in URL.finditer(line):
                if not ALLOWED_URL.match(m.group(0)):
                    hits["non-public-url"].append(f"{f}:{i}: {m.group(0)[:120]}")
            if BUCKET.search(line):
                hits["bucket"].append(f"{f}:{i}: {ls[:120]}")
            if CHAT_LINK.search(line):
                hits["chat-link"].append(f"{f}:{i}: {ls[:120]}")
            if KEYLIKE.search(line):
                hits["credential"].append(f"{f}:{i}: {ls[:120]}")
    result = {
        "scanned_commit": sha,
        "files_scanned": len(scan),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = os.path.join(ROOT, "tools", "leakscan_result.json")
    json.dump(result, open(out, "w"), indent=2)
    print(json.dumps({k: len(v) for k, v in hits.items()}, indent=None),
          "commit", sha[:12], "files", len(scan))
    return 0 if result["n_hits"] == 0 else 1

if __name__ == "__main__":
    sys.exit(main())
