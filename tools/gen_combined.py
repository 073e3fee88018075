#!/usr/bin/env python3
"""Combined-axis decade corpus: facts x10 AND docs x10 AND skew in ONE
corpus, by chaining the three single-axis generators (each of which documents
its own distribution-preservation argument):

  sf0.1 --gen_sf1--> facts x10 --gen_docs10--> + docs x10 --gen_skew--> + skew

The single-axis decades (BASELINE.md r8/r9) prove each family linear in
isolation; this corpus catches CROSS-family interference — shared
materialized artifacts competing for executor memory, skew landing on an
already-10x shuffle, the page-cache working set of both fact and document
decades at once.

Usage: python3 tools/gen_combined.py [dst=/tmp/combined] [src=/root/testdata/sf0.1]
"""
import os
import subprocess
import sys
import tempfile

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/combined"
src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
here = os.path.dirname(os.path.abspath(__file__))

with tempfile.TemporaryDirectory(prefix="graft_combined_") as tmp:
    s1 = os.path.join(tmp, "facts10")
    s2 = os.path.join(tmp, "facts10_docs10")
    for script, args in [
        ("gen_sf1.py", [s1, src]),          # facts x10, shifted keys
        ("gen_docs10.py", [s2, s1]),        # + docs/embeddings x10, perturbed replicas
        ("gen_skew.py", [dst, s2]),         # + zipf lengths, hot shingle family, hot user, hot order key
    ]:
        print(f"== {script} {' '.join(args)}", flush=True)
        subprocess.run([sys.executable, os.path.join(here, script)] + args, check=True)
print(f"combined corpus at {dst}")
