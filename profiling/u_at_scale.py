"""The U (novel-species) pipeline at bench scale (VERDICT r3 item 7).

Builds a real DB DIRECTORY around the 1 Gbp bench shard (same seeded
genomes the headline bench maps against), then runs the full reference
chain on the headline bench's 16k-read mappings:

  classify (doEM, fEM.h:466)
    -> selfSimilarity (estimateSelfSimilarity.pl prepare/doJobI/collect)
    -> classifyU (doU, fU.h:1085)

and records wall times + output sanity in U_SCALE.json at the repo root.

The selfSimilarity chunk workload is reduced and RECORDED as such
(sim lengths 2000..10000 step 4000, <=60 chunks/length vs the reference's
2000..50000 step 1000 <=2000 — that full workload is an SGE-cluster
matter, estimateSelfSimilarity.pl:36-43,180-186); jobs run under a global
time budget, and `collect` tolerates missing jobs by design
(estimateSelfSimilarity.pl:1262-1305) — completed/total is recorded.

Run AFTER `python bench.py --dump-mappings .bench_cache/bench_mappings_16k.txt`:
    python profiling/u_at_scale.py [--budget-s 5400]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DB_DIR = os.path.join(ROOT, ".bench_cache", "u_db")
MAPPINGS = os.path.join(ROOT, ".bench_cache", "bench_mappings_16k.txt")
SIM_KW = dict(sim_from=2000, sim_to=10000, sim_step=4000, max_chunks=60)


def build_db_dir():
    """Write the full DB-dir contract for the bench shard: DB.fa,
    taxonInfo.txt, contigNstats, taxonomy/ with x-pseudo-nodes for the
    duplicated genomes (annotateRefSeqSequences semantics)."""
    from metamaps_tpu.sim.synth_db import synth_structured_db

    os.makedirs(os.path.join(DB_DIR, "taxonomy"), exist_ok=True)
    rng = np.random.default_rng(20260820)
    genomes, names = synth_structured_db(rng, total_bases=1_000_000_000)

    def dmp(*fields):
        return "\t|\t".join(str(f) for f in fields) + "\t|\n"

    # taxonomy: root -> bacteria -> 2 families -> 4 genera -> 12 species;
    # x-nodes for the 3 duplicated genomes attach under their source species
    with open(os.path.join(DB_DIR, "taxonomy", "names.dmp"), "w") as nf, \
            open(os.path.join(DB_DIR, "taxonomy", "nodes.dmp"), "w") as df:
        nf.write(dmp(1, "root", "", "scientific name"))
        df.write(dmp(1, 1, "no rank"))
        nf.write(dmp(2, "Bacteria", "", "scientific name"))
        df.write(dmp(2, 1, "superkingdom"))
        for fam in range(2):
            nf.write(dmp(50 + fam, f"Family{fam}", "", "scientific name"))
            df.write(dmp(50 + fam, 2, "family"))
        for g in range(4):
            nf.write(dmp(100 + g, f"Genus{g}", "", "scientific name"))
            df.write(dmp(100 + g, 50 + g % 2, "genus"))
        for i in range(12):
            nf.write(dmp(1000 + i, f"Species{i}", "", "scientific name"))
            df.write(dmp(1000 + i, 100 + i % 4, "species"))
        # the bench's duplicated genomes: names carry x-taxon ids x2000+di
        # with source genome src encoded in the name (G12_dup{src}|...)
        for di, name in enumerate(n for n in names if "|x" in n):
            src = int(name.split("_dup")[1].split("|")[0])
            nf.write(dmp(f"x{2000 + di}", f"Species{src} genome {di + 2}",
                         "", "scientific name"))
            df.write(dmp(f"x{2000 + di}", 1000 + src, "no rank"))
    with open(os.path.join(DB_DIR, "taxonomy", "merged.dmp"), "w") as f:
        f.write("")

    with open(os.path.join(DB_DIR, "DB.fa"), "w") as fa, \
            open(os.path.join(DB_DIR, "taxonInfo.txt"), "w") as ti, \
            open(os.path.join(DB_DIR,
                              "contigNstats_windowSize_1000.txt"), "w") as ns:
        for g, name in zip(genomes, names):
            tax = name.split("kraken:taxid|")[1].split("|")[0]
            fa.write(f">{name}\n")
            s = g.tobytes().decode()
            for j in range(0, len(s), 10000):
                fa.write(s[j : j + 10000] + "\n")
            ti.write(f"{tax} {name}={len(g)}\n")
            nw = (len(g) + 999) // 1000
            ns.write(f"{tax}\t{name}\t" + ";".join(["0"] * nw) + "\n")
    return sum(len(g) for g in genomes)


def main():
    budget_s = 5400
    if "--budget-s" in sys.argv:
        budget_s = int(sys.argv[sys.argv.index("--budget-s") + 1])
    assert os.path.exists(MAPPINGS), (
        f"run bench.py --dump-mappings {MAPPINGS} first")
    import jax

    jax.config.update("jax_platforms", "cpu")  # host pipeline, chip not needed

    from metamaps_tpu.cli import main as cli

    rec = {"artifact": "U pipeline at bench scale (VERDICT r3 item 7)",
           "date": "2026-08-21", "mappings": os.path.basename(MAPPINGS),
           "mapping_lines": sum(1 for _ in open(MAPPINGS))}

    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(DB_DIR, "taxonInfo.txt")):
        rec["db_bases"] = build_db_dir()
        rec["db_build_s"] = round(time.perf_counter() - t0, 1)
    print(f"# DB dir ready ({rec.get('db_build_s', 'cached')})", flush=True)

    # --- classify (EM) ----------------------------------------------------
    t0 = time.perf_counter()
    rc = cli(["classify", "--mappings", MAPPINGS, "--DB", DB_DIR,
              "--minreads", "100"])
    assert rc in (0, None)
    rec["classify_s"] = round(time.perf_counter() - t0, 1)
    wimp = MAPPINGS + ".EM.WIMP"
    rec["em_wimp_rows"] = sum(1 for _ in open(wimp)) - 1
    print(f"# classify: {rec['classify_s']} s", flush=True)

    # --- selfSimilarity ---------------------------------------------------
    from metamaps_tpu.db import self_similarity as ss

    out_dir = os.path.join(DB_DIR, "selfSimilarity")
    t0 = time.perf_counter()
    jobs = ss.prepare(DB_DIR, out_dir)
    rec["selfsim_jobs_total"] = len(jobs)
    rec["selfsim_params"] = dict(SIM_KW)
    job_s = []
    done = 0
    for i, job in enumerate(jobs):
        res_fn = os.path.join(out_dir, "results", f"{i}.json")
        if os.path.exists(res_fn):
            done += 1
            continue
        if time.perf_counter() - t0 > budget_s:
            break
        tj = time.perf_counter()
        ss.run_job(DB_DIR, job, out_dir, i, **SIM_KW)
        job_s.append(round(time.perf_counter() - tj, 1))
        done += 1
        print(f"# selfSim job {i}/{len(jobs)}: {job_s[-1]} s", flush=True)
    rec["selfsim_jobs_done"] = done
    rec["selfsim_job_s"] = job_s
    print(ss.collect(DB_DIR, out_dir), flush=True)
    rec["selfsim_total_s"] = round(time.perf_counter() - t0, 1)
    ss_fn = os.path.join(DB_DIR, "selfSimilarities.txt")
    rec["selfsim_lines"] = sum(1 for _ in open(ss_fn))

    # --- classifyU --------------------------------------------------------
    t0 = time.perf_counter()
    rc = cli(["classifyU", "--mappings", MAPPINGS, "--DB", DB_DIR,
              "--minreads", "100"])
    assert rc in (0, None)
    rec["classifyU_s"] = round(time.perf_counter() - t0, 1)
    uw = MAPPINGS + ".U.WIMP"
    rec["u_wimp_rows"] = sum(1 for _ in open(uw)) - 1
    r2t = MAPPINGS + ".U.reads2Taxon"
    rec["u_reads2taxon_rows"] = sum(1 for _ in open(r2t))
    print(f"# classifyU: {rec['classifyU_s']} s", flush=True)

    with open(os.path.join(ROOT, "U_SCALE.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
