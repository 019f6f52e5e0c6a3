#!/usr/bin/env python3
"""Repeatable 10x scale probe (dev tool, mirrors the r12 ad-hoc waves).

Question the per-round sf0.1 bench can't answer: does each operator's
RUNTIME scale like its design claims when the data grows? This tool makes
the answer one command instead of commit archaeology:

  1. builds a 10x corpus from sf0.1 into --probe-dir (cached; --regen to
     rebuild), with the same construction the r12 waves used:
       * documents x10  — replica k appends a per-replica tag token
         (' zq<k>x<doc_id>'), so replicas keep the corpus dup-RATE instead
         of becoming exact dups of their source
       * embeddings x10 — deterministic per-dimension perturbation
         (+0.01 * ((k*31 + i) % 7 - 3)), so replicas are distinct directions
       * lineitem  x10  — fresh order keys (same part/supplier vocabulary:
         the densified-backbone effect on co-occurrence graphs is the POINT)
       * events    x10  — fresh event and user ids
       * dimension tables copied unchanged
  2. runs graft.Bench over the probed tier at sf0.1 and at 10x
     (SPARK_GRAFT_BENCH_REF pointed at a missing file so the clean-reference
     re-measure trigger stays out of the probe's way)
  3. asserts each query's 10x time is at-or-below-linear:
     t10 <= max(BOUND * t1, FLOOR) with BOUND = 10 by default, FLOOR = 1.5 s
     (sub-second queries are overhead-dominated; tripling from scheduler
     noise alone is not a scaling defect), and documented per-query bounds
     where the OUTPUT itself grows super-linearly by construction
  4. writes a BENCH-like JSON artifact (default STRESS_PROBE.json)

Usage:
  python3 tools/stress_probe.py [--tier wave1|wave2|wave3|wave4|all]
                                [--queries q_a,q_b] [--regen]
                                [--sf-dir /root/testdata/sf0.1]
                                [--probe-dir /tmp/graft_stress10x]
                                [--out STRESS_PROBE.json]

Exit 1 when any probed query scales super-linearly past its bound.
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench_gate import load_queries  # noqa: E402

REPO = Path(__file__).resolve().parent.parent

# The r12 wave composition, kept as named tiers so "re-verify wave N after
# a change" is one flag. Names are registry query names (SparkEntry.queries).
# NOT probed: the planted-fixture media queries (q_audio_neardup*,
# q_gif_neardup*, q_image_*) — their inputs are fixed-size synthetic plants
# (96 payloads regardless of sf dir), so a "10x" run would measure nothing.
TIERS = {
    "wave1": [  # dedup / IR / embeddings over documents+embeddings
        "q_similarity_topk", "q_ann_lsh", "q_ivf_ann", "q_text_dedup_exact",
        "q_token_stats", "q_keyword_spot", "q_bitext_mine", "q_semantic_dedup",
        "q_minhash_lsh", "q_quality_score", "q_winnow_pairs",
        "q_text_dedup_near", "q_lang_id", "q_bpe_apply", "q_simhash",
    ],
    "wave2": [  # curation / pipeline over documents
        "q_doc_chunks", "q_pack_sequences", "q_mask_tokens", "q_pii_redact",
        "q_keyword_redact", "q_leakage_split", "q_hash_split", "q_mix_sources",
        "q_decontaminate", "q_boilerplate_strip", "q_char_entropy",
        "q_repetition_stats", "q_readability", "q_dataset_card",
        "q_containment_dedup", "q_dedup_clusters", "q_winnow", "q_dsir_sample",
        "q_lang_gate",
    ],
    "wave3": [  # graph / stats over lineitem+events facts
        "q_pagerank", "q_triangle_count", "q_clustering_coeff", "q_kcore",
        "q_graph_reach", "q_rank_sum", "q_changepoint", "q_bootstrap_ci",
        "q_triangle_capped", "q_clustering_capped", "q_triangle_doulion",
    ],
    "wave4": [  # embeddings-heavy r13/r14 additions (r13 VERDICT gap #2)
        "q_kcenter_select", "q_kcenter_assign", "q_tokenizer_fertility",
        "q_semantic_dedup_incr", "q_adc_rerank",
    ],
}
TIERS["all"] = TIERS["wave1"] + TIERS["wave2"] + TIERS["wave3"] + TIERS["wave4"]

# Queries whose OUTPUT grows super-linearly on this corpus BY CONSTRUCTION
# (replicas of one doc are near-dups of their source, so pair volume grows
# ~quadratically in the per-doc replica count). Runtime tracking output is
# the banding design CLAIM — bound these by measured r12 headroom instead
# of the 10x default. See ARCHITECTURE.md "Measured 10x scale-up".
OUTPUT_GROWTH_BOUNDS = {
    "q_simhash": 16.0,            # r12: 12.9x at 975x output growth
    "q_embedding_neardup_lsh": 10.0,
}

FLOOR_SEC = 1.5
DEFAULT_BOUND = 10.0


def build_10x(sf_dir: str, probe_dir: str) -> None:
    import duckdb
    os.makedirs(probe_dir, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET preserve_insertion_order=false")
    ks = "(SELECT unnest(range(0, 10)) AS k) reps"

    def copy(sql: str, table: str) -> None:
        dest = f"{probe_dir}/{table}.parquet"
        con.sql(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"  {table}: {n} rows")

    d = f"'{sf_dir}/documents.parquet'"
    off = con.sql(f"SELECT max(doc_id) + 1 FROM {d}").fetchone()[0]
    copy(f"""SELECT * REPLACE (doc_id + k * {off} AS doc_id,
               text || CASE WHEN k = 0 THEN ''
                            ELSE ' zq' || k || 'x' || doc_id END AS text)
             FROM {d} CROSS JOIN {ks}""", "documents")

    e = f"'{sf_dir}/embeddings.parquet'"
    off = con.sql(f"SELECT max(vec_id) + 1 FROM {e}").fetchone()[0]
    copy(f"""SELECT * REPLACE (vec_id + k * {off} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                 ELSE list_transform(range(1, len(embedding) + 1),
                   i -> embedding[i] + 0.01 * ((k * 31 + i) % 7 - 3))::FLOAT[]
               END AS embedding)
             FROM {e} CROSS JOIN {ks}""", "embeddings")

    li = f"'{sf_dir}/lineitem.parquet'"
    off = con.sql(f"SELECT max(l_orderkey) + 1 FROM {li}").fetchone()[0]
    copy(f"SELECT * REPLACE (l_orderkey + k * {off} AS l_orderkey) "
         f"FROM {li} CROSS JOIN {ks}", "lineitem")

    ev = f"'{sf_dir}/events.parquet'"
    eoff, uoff = con.sql(
        f"SELECT max(event_id) + 1, max(user_id) + 1 FROM {ev}").fetchone()
    copy(f"""SELECT * REPLACE (event_id + k * {eoff} AS event_id,
               user_id + k * {uoff} AS user_id)
             FROM {ev} CROSS JOIN {ks}""", "events")

    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        copy(f"SELECT * FROM '{sf_dir}/{t}.parquet'", t)


def run_bench(queries, sf_dir: str, log_path: str):
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(queries),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               # a missing reference disables the clean-run re-measure
               # trigger: at 10x everything would "regress" vs sf0.1 refs
               SPARK_GRAFT_BENCH_REF="/nonexistent-no-bench-ref")
    with open(log_path, "w") as log:
        rc = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT).returncode
    if rc != 0:
        raise SystemExit(f"bench run failed (rc {rc}), log: {log_path}")
    q, partial = load_queries(log_path)
    if partial:
        raise SystemExit(f"bench log lost its all_queries line: {log_path}")
    return q


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="wave1", choices=sorted(TIERS))
    ap.add_argument("--queries", help="comma-separated override of the tier")
    ap.add_argument("--regen", action="store_true",
                    help="rebuild the 10x corpus even if cached")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--probe-dir", default="/tmp/graft_stress10x")
    ap.add_argument("--out", default=str(REPO / "STRESS_PROBE.json"))
    args = ap.parse_args(argv)

    queries = (args.queries.split(",") if args.queries else TIERS[args.tier])
    marker = Path(args.probe_dir) / "orders.parquet"  # written last
    if args.regen or not marker.exists():
        print(f"building 10x corpus from {args.sf_dir} -> {args.probe_dir}")
        build_10x(args.sf_dir, args.probe_dir)
    else:
        print(f"10x corpus cached at {args.probe_dir} (use --regen to rebuild)")

    t0 = time.time()
    print(f"bench at sf0.1 ({len(queries)} queries)...")
    base = run_bench(queries, args.sf_dir, "/tmp/stress_probe_base.log")
    print(f"bench at 10x...")
    x10 = run_bench(queries, args.probe_dir, "/tmp/stress_probe_10x.log")

    rows, failures = {}, []
    for q in queries:
        b, t = base.get(q, -1.0), x10.get(q, -1.0)
        if b < 0 or t < 0:
            failures.append(f"ERRORED {q}: base={b} x10={t}")
            rows[q] = {"base_s": b, "x10_s": t, "ratio": None, "ok": False}
            continue
        bound = OUTPUT_GROWTH_BOUNDS.get(q, DEFAULT_BOUND)
        ratio = round(t / b, 2) if b > 0 else None
        ok = t <= max(bound * b, FLOOR_SEC)
        rows[q] = {"base_s": b, "x10_s": t, "ratio": ratio,
                   "bound": bound, "ok": ok}
        line = f"  {q}: {b:.2f}s -> {t:.2f}s ({ratio}x, bound {bound}x)"
        if not ok:
            failures.append(f"SUPER-LINEAR {q}: {b:.2f}s -> {t:.2f}s "
                            f"({ratio}x > {bound}x)")
            line += "  <-- SUPER-LINEAR"
        print(line)

    # per-tier results MERGE into the artifact (a wave1 run must not erase
    # the wave3 record): the file keys tiers, each with its own run block
    out_path = Path(args.out)
    try:
        artifact = json.loads(out_path.read_text())
        if artifact.get("metric") != "stress_probe_10x":
            artifact = {}
    except (FileNotFoundError, json.JSONDecodeError):
        artifact = {}
    artifact.update({"metric": "stress_probe_10x", "sf_dir": args.sf_dir,
                     "probe_dir": args.probe_dir, "floor_sec": FLOOR_SEC,
                     "default_bound": DEFAULT_BOUND})
    artifact.setdefault("tiers", {})[args.tier] = {
        "wall_s": round(time.time() - t0, 1), "queries": rows,
        "ok": not failures}
    out_path.write_text(json.dumps(artifact, indent=1, sort_keys=True) + "\n")
    print(f"artifact -> {args.out}")
    for f in failures:
        print(f)
    print(("OK" if not failures else "FAIL") +
          f": {len(rows)} queries probed, {len(failures)} findings")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
