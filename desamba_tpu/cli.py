"""Command-line interface mirroring the reference's subcommands
(main.c:35-53): kmersort | index | classify | analysis.

`index` accepts either the reference's 3-arg form
(`index <kmer.srt> <ref.fa> <dir>`) or a 2-arg form (`index <ref.fa> <dir>`)
since the builder extracts k-mers itself. `classify` supports the
reference's options (cly_mt.c:470-498) plus `--engine {oracle,tpu}`.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def cmd_kmersort(argv):
    ap = argparse.ArgumentParser(prog="desamba-tpu kmersort")
    ap.add_argument("input", help="Jellyfish binary dump or FASTA file")
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("-o", default="kmer.srt")
    a = ap.parse_args(argv)
    import numpy as np

    from .index.kmers import extract_kmers, read_jellyfish_dump, write_kmer_srt

    with open(a.input, "rb") as f:
        magic = f.read(8)
    if magic == b"JFLISTDN":
        km = np.unique(read_jellyfish_dump(a.input))
    else:
        km = extract_kmers(a.input, a.k)
    write_kmer_srt(a.o, km)
    print(f"kmer number:{km.size}", file=sys.stderr)


def cmd_index(argv):
    ap = argparse.ArgumentParser(prog="desamba-tpu index")
    ap.add_argument("args", nargs="+", help="[kmer.srt] <ref.fa> <index_dir>")
    ap.add_argument("--native", action="store_true",
                    help="also write the native tensor format")
    ap.add_argument("--shards", type=int, default=1,
                    help="build N genome-sharded sub-indexes + manifest "
                         "(parallel/shard_index.py) instead of one index")
    a = ap.parse_args(argv)
    from .index.build import build_index
    from .index.format_ref import save_ref_format

    if len(a.args) == 3:
        _, ref, out = a.args
    elif len(a.args) == 2:
        ref, out = a.args
    else:
        ap.error("expected [kmer.srt] <ref.fa> <index_dir>")
    if a.shards > 1:
        from .parallel.shard_index import build_sharded_index

        t0 = time.time()
        dirs = build_sharded_index(ref, out, a.shards)  # parallel procs
        print(f"sharded index ({a.shards} shards, "
              f"{min(a.shards, os.cpu_count() or 1)} parallel build "
              f"processes) built in {time.time()-t0:.1f}s: {out}",
              file=sys.stderr)
        return
    t0 = time.time()
    idx = build_index(ref, progress=lambda s: print(f"[{s}]", file=sys.stderr))
    save_ref_format(idx, out)
    if a.native:
        from .index.tensor_index import save_tensor_format

        save_tensor_format(idx, out)
    import resource

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"index built in {time.time()-t0:.1f}s: {idx.n_kmer} kmers, "
          f"{idx.n_unitig} unitigs, peak RSS {rss_gb:.2f} GB "
          f"({rss_gb * 1e9 / max(1, idx.ref_total):.1f} B/bp)",
          file=sys.stderr)


def cmd_classify(argv):
    ap = argparse.ArgumentParser(prog="desamba-tpu classify")
    ap.add_argument("index_dir")
    ap.add_argument("reads", nargs="+")
    ap.add_argument("-t", type=int, default=4, help="threads (native engine workers)")
    ap.add_argument("-l", type=int, default=170, help="min matching length")
    ap.add_argument("-r", type=int, default=5, help="max secondary alignments")
    ap.add_argument("-o", default=None, help="output file [stdout]")
    ap.add_argument("-s", type=int, default=64, help="min score")
    ap.add_argument("-f", default="SAM", choices=["SAM", "SAM_FULL", "DES", "DES_FULL"])
    ap.add_argument("--engine", default="native",
                    choices=["native", "oracle", "tpu", "sharded", "fast"])
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the device pipeline")
    ap.add_argument("--timers", action="store_true",
                    help="print per-stage wall timers (FUNC_GET_TIME analog)")
    a = ap.parse_args(argv)

    import os

    from .io.fastx import read_fastx
    from .utils.timers import SectionTimes, cputime, device_trace

    out = open(a.o, "w") if a.o else sys.stdout
    st = SectionTimes()
    t0 = time.time()
    cpu0 = cputime()
    total = 0
    output_seq = a.f == "SAM_FULL"
    if os.path.exists(os.path.join(a.index_dir, "shards.json")):
        a.engine = "sharded"
    if a.engine == "sharded":
        from .constants import N_NEEDED
        from .parallel.shard_index import ShardedEngine

        eng = ShardedEngine(a.index_dir, n_threads=a.t)
        for path in a.reads:
            print(f"Processing file: [{path}].", file=sys.stderr)
            batch = []
            for r in read_fastx(path):
                total += 1
                batch.append((r.name, r.seq, r.qual))
                if len(batch) >= N_NEEDED:
                    out.write(eng.classify_to_sam(batch, output_seq, a.r))
                    batch.clear()
            out.write(eng.classify_to_sam(batch, output_seq, a.r))
    elif a.engine == "native":
        from .constants import N_NEEDED
        from .engine.native import NativeClassifier
        from .index.format_ref import RefFormatIndex
        from .io.sam import format_des, format_des_full
        from .oracle.classify import OracleIndex
        from .oracle.driver import format_sam

        idx = OracleIndex(RefFormatIndex(a.index_dir),
                          filter_min_length=a.l, filter_min_score=a.s)
        eng = NativeClassifier(idx, n_threads=a.t)
        for path in a.reads:
            print(f"Processing file: [{path}].", file=sys.stderr)
            batch = []

            def flush():
                for res in eng.classify_batch(batch):
                    if getattr(res, "aborted", False):
                        continue  # the reference binary would crash here
                    if a.f == "DES":
                        out.write(format_des(idx.ref_names, res, a.r))
                    elif a.f == "DES_FULL":
                        out.write(format_des_full(idx.ref_names, res))
                    else:
                        out.write(format_sam(idx, res, output_seq, a.r))
                batch.clear()

            for r in read_fastx(path):
                total += 1
                batch.append((r.name, r.seq, r.qual))
                if len(batch) >= N_NEEDED:
                    flush()
            flush()
    elif a.engine == "fast":
        # device-resident throughput mode: taxonomic call per read, DES-style
        # line output (no per-base alignment — use the exact engines for SAM).
        # 3-stage overlap like the reference's kt_pipeline (kthread.c:157-197,
        # cly_mt.c:361-381): a reader thread parses FASTQ batches into a
        # bounded queue (step 0) while the main thread runs the device
        # pipeline (step 1) and writes results (step 2) — classify_batch
        # itself additionally overlaps host encode with device compute.
        import queue
        import threading

        from .constants import N_NEEDED
        from .engine.fast_engine import FastClassifier
        from .index.format_ref import RefFormatIndex
        from .oracle.classify import OracleIndex

        idx = OracleIndex(RefFormatIndex(a.index_dir))
        eng = FastClassifier(idx, min_score=a.s)
        q: "queue.Queue" = queue.Queue(maxsize=4)

        def reader():
            for path in a.reads:
                print(f"Processing file: [{path}].", file=sys.stderr)
                batch = []
                with st.section("read_reads"):
                    for r in read_fastx(path):
                        batch.append((r.name, r.seq, r.qual))
                        if len(batch) >= N_NEEDED:
                            q.put(batch)
                            batch = []
                if batch:
                    q.put(batch)
            q.put(None)

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        with device_trace(a.profile):
            while (batch := q.get()) is not None:
                total += len(batch)
                with st.section("classify_device"):
                    results = eng.classify_batch(batch)
                with st.section("output_results"):
                    for res in results:
                        ref = (idx.ref_names[res.ref_ID]
                               if res.ref_ID >= 0 else "*")
                        out.write(f"{res.name}\t{ref}\t{res.direction}\t"
                                  f"{res.score}\t{res.read_len}\n")
        th.join()
    elif a.engine == "tpu":
        from .engine.tpu_engine import TpuClassifier
        from .index.format_ref import RefFormatIndex
        from .oracle.classify import OracleIndex

        idx = OracleIndex(RefFormatIndex(a.index_dir),
                          filter_min_length=a.l, filter_min_score=a.s)
        eng = TpuClassifier(idx)
        for path in a.reads:
            print(f"Processing file: [{path}].", file=sys.stderr)
            reads = [(r.name, r.seq, r.qual) for r in read_fastx(path)]
            total += len(reads)
            out.write(eng.classify_to_sam(reads, output_seq=output_seq,
                                          max_sec_n=a.r))
    else:
        from .index.format_ref import RefFormatIndex
        from .io.sam import format_des, format_des_full
        from .oracle.classify import OracleIndex
        from .oracle.driver import OracleClassifier, format_sam

        idx = OracleIndex(RefFormatIndex(a.index_dir),
                          filter_min_length=a.l, filter_min_score=a.s)
        cl = OracleClassifier(idx)
        for path in a.reads:
            print(f"Processing file: [{path}].", file=sys.stderr)
            for r in read_fastx(path):
                total += 1
                res = cl.classify_read(r.name, r.seq, r.qual)
                if a.f == "DES":
                    out.write(format_des(idx.ref_names, res, a.r))
                elif a.f == "DES_FULL":
                    out.write(format_des_full(idx.ref_names, res))
                else:
                    out.write(format_sam(idx, res, output_seq, a.r))
    secs = time.time() - t0
    print(f"{total} sequences processed in {secs:.3f}s "
          f"({total / 1.0e3 / (secs / 60):.1f} Kseq/m).", file=sys.stderr)
    # the reference's CPU-time report (cly_mt.c:558)
    print(f"Classify CPU: {cputime() - cpu0:.3f} sec", file=sys.stderr)
    if a.timers:
        st.report()
    if a.o:
        out.close()


def cmd_analysis(argv):
    if not argv:
        print("analysis subcommands: ana_meta ana_meta_rst ana_tax "
              "count_base fastq_to_fasta split_fastq reverse_read file_cmp",
              file=sys.stderr)
        return 1
    sub, rest = argv[0], argv[1:]
    from .analysis import cli_cmds

    return cli_cmds.dispatch(sub, rest)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: desamba-tpu {kmersort|index|classify|analysis|fqx|"
              "test_cpp} ...",
              file=sys.stderr)
        return 1
    cmd, rest = argv[0], argv[1:]
    show_title = True  # main.c:36,43: analysis suppresses the exit line
    try:
        if cmd == "kmersort":
            return cmd_kmersort(rest)
        if cmd == "index":
            return cmd_index(rest)
        if cmd == "classify":
            return cmd_classify(rest)
        if cmd == "analysis":
            show_title = False
            return cmd_analysis(rest)
        if cmd == "fqx":
            from .tools.fqx import main as fqx_main

            return fqx_main(rest)
        if cmd == "test_cpp":
            # the reference's build-sanity stub (main.c:44, test_cpp.c:11)
            print("END main_test_cpp!", file=sys.stderr)
            return 0
        print(f"unknown command [{cmd}]", file=sys.stderr)
        return 1
    finally:
        if show_title:
            from .utils.timers import report_peak_rss

            report_peak_rss()


if __name__ == "__main__":
    sys.exit(main())
