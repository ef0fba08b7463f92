"""Oracle-artifact staleness guard (r10 verdict task 3).

The full-registry artifacts (ORACLE_FULL.json, ORACLE_FULL_SF01.json)
record the commit they were generated at (``commit`` key, stamped by
check_oracle.py --json).  This check fails when any commit AFTER that
one touches registry-affecting code — the operator modules, the source
loaders, the driver contract, or the oracle harness itself — i.e. when
the artifact no longer proves anything about HEAD.

Round-close checklist:

    python tools/check_oracle.py --json ORACLE_FULL.json /root/testdata/sf0.01
    python tools/check_oracle.py --json ORACLE_FULL_SF01.json /root/testdata/sf0.1
    python tools/check_artifact_fresh.py          # must exit 0

Exit codes: 0 fresh, 1 stale/unverifiable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = ("ORACLE_FULL.json", "ORACLE_FULL_SF01.json",
             "ORACLE_SAMPLE.json")
# paths whose changes can alter any registry query's plan or result
REGISTRY_PATHS = ("bigarrays_jl_spark/", "__spark_entry__.py",
                  "tools/check_oracle.py")


def _git(*argv: str) -> str:
    return subprocess.run(["git", *argv], capture_output=True, text=True,
                          cwd=REPO, check=True).stdout.strip()


def check(path: str) -> list[str]:
    """Problems for one artifact ([] = fresh)."""
    full = os.path.join(REPO, path)
    if not os.path.exists(full):
        return [f"{path}: missing"]
    with open(full) as f:
        art = json.load(f)
    commit = art.get("commit")
    if not commit:
        return [f"{path}: no generating-commit stamp (regenerate with "
                "the current tools/check_oracle.py)"]
    try:
        _git("cat-file", "-e", f"{commit}^{{commit}}")
    except subprocess.CalledProcessError:
        return [f"{path}: stamped commit {commit[:12]} unknown to this repo"]
    stale = _git("log", "--oneline", f"{commit}..HEAD", "--",
                 *REGISTRY_PATHS)
    if stale:
        lines = stale.splitlines()
        return [f"{path}: {len(lines)} registry-touching commit(s) after "
                f"{commit[:12]}:"] + [f"  {ln}" for ln in lines]
    if art.get("n_failures", 1) != 0:
        return [f"{path}: records {art['n_failures']} failures"]
    return []


def working_tree_dirty() -> list[str]:
    """Uncommitted (staged OR unstaged) edits to registry paths also
    invalidate the artifacts — the code being verified is not the code
    the artifact was generated from, even if no commit exists yet."""
    dirty = _git("status", "--porcelain", "--", *REGISTRY_PATHS)
    if not dirty:
        return []
    lines = dirty.splitlines()
    return [f"working tree: {len(lines)} uncommitted registry edit(s):"] + \
           [f"  {ln}" for ln in lines]


# --- doc-quoted numbers vs the artifacts they cite (r16 verdict task 4:
# SURVEY §2C quoted set_sim_join at 3.2× while SCALE_SF1.json said 5.87×
# — factual drift that survived a round close).  Each claim is (doc,
# regex-with-one-capture, artifact, getter, label); every regex MATCH in
# the doc must equal the artifact value at the doc's printed precision.
# A claim whose regex matches nothing is skipped (the sentence was
# removed/reworded — nothing to drift).
DOC_CLAIMS = (
    ("SURVEY.md", r"sf1 proof at ([0-9.]+)×", "SCALE_SF1.json",
     lambda a: a["queries"]["set_sim_join"]["ratio"],
     "set_sim_join sf1 ratio"),
    ("SCALE.md", r"sf0\.1→sf1 \(([0-9.]+)×, was 453", "SCALE_SF1.json",
     lambda a: a["queries"]["set_sim_join"]["ratio"],
     "set_sim_join sf1 ratio"),
    # NOT claimed: figures the docs stamp to a PAST round ("55 queries
    # (r12 close)", "244 as of round 13") are history, not live claims
    # — checking them against the current artifact would flag every
    # legitimate registry growth.
    ("SCALE.md", r"`streaming_curate` late/early \*\*([0-9.]+)\*\*",
     "SCALE_STREAM.json",
     lambda a: a["bridges"]["streaming_curate"]["late_vs_early"],
     "streaming_curate late/early ratio"),
    ("SCALE.md", r"`streaming_minhash_neardup`\s+\*\*([0-9.]+)\*\*",
     "SCALE_STREAM.json",
     lambda a: a["bridges"]["streaming_minhash_neardup"]["late_vs_early"],
     "streaming_minhash_neardup late/early ratio"),
    ("SCALE.md", r"`streaming_ann_ingest`\s+\*\*([0-9.]+)\*\*",
     "SCALE_STREAM.json",
     lambda a: a["bridges"]["streaming_ann_ingest"]["late_vs_early"],
     "streaming_ann_ingest late/early ratio"),
)


def doc_number_drift() -> list[str]:
    import re
    problems = []
    for doc, pattern, artifact, getter, label in DOC_CLAIMS:
        doc_path = os.path.join(REPO, doc)
        art_path = os.path.join(REPO, artifact)
        if not (os.path.exists(doc_path) and os.path.exists(art_path)):
            continue
        with open(art_path) as f:
            try:
                want = getter(json.load(f))
            except (KeyError, TypeError):
                problems.append(f"{doc}: claim '{label}' cites {artifact} "
                                "but the cited key is gone")
                continue
        with open(doc_path) as f:
            text = f.read()
        for m in re.finditer(pattern, text):
            got = m.group(1)
            # compare at the doc's own printed precision
            dec = len(got.split(".")[1]) if "." in got else 0
            if float(got) != round(float(want), dec):
                problems.append(
                    f"{doc}: quotes {label} = {got} but {artifact} says "
                    f"{want} — update the doc or restamp the artifact")
    return problems


def main() -> int:
    problems = working_tree_dirty()
    for a in ARTIFACTS:
        problems += check(a)
    problems += doc_number_drift()
    if problems:
        print("STALE oracle artifacts:")
        print("\n".join(problems))
        return 1
    print("oracle artifacts fresh: generated at HEAD-equivalent registry "
          "state, 0 failures")
    return 0


if __name__ == "__main__":
    sys.exit(main())
