"""Persistent-index engine API — the `desamba.h` contract in Python.

Mirrors the .so semantics (load_index / read_classify / meta_analysis,
desamba.h:10-45): the index is loaded once and kept resident; each caller
thread_id owns a reusable buffer whose classify state (max_read_l filter
mode, bin-buffer growth) persists across calls, exactly like the
RM_buffer registry (cly_mt.c:1279-1307).

The classify backend is pluggable: 'oracle' (bit-exact NumPy model) or
'tpu' (batched JAX engine, desamba_tpu.engine.tpu_engine).
"""
from __future__ import annotations

import os
import threading

from ..constants import MAX_HUMAN_SNAPSHOT_LEN, META_USE_READ_NUM
from ..index.format_ref import RefFormatIndex
from ..io.fastx import read_fastx
from ..io.taxonomy import load_taxonomy_engine
from ..analysis.meta import meta_analysis as _meta_analysis
from ..oracle.classify import OracleIndex
from ..oracle.driver import OracleClassifier, format_sam


class _ThreadBuff:
    def __init__(self, engine, thread_num: int):
        self.thread_num = thread_num
        self.backend = engine._new_backend(thread_num)


class Engine:
    """load_index (cly_mt.c:1238-1274): index + MAPQ + taxonomy, once."""

    def __init__(self, index_dir: str, backend: str = "native",
                 filter_min_length: int = 170, filter_min_score: int = 64):
        self.index_dir = index_dir
        self.backend_kind = backend
        self.fm = RefFormatIndex(index_dir)
        self.idx = OracleIndex(
            self.fm,
            filter_min_length=filter_min_length,
            filter_min_score=filter_min_score,
        )
        self.tax = load_taxonomy_engine(index_dir)
        self._buffs: dict[int, _ThreadBuff] = {}
        self._lock = threading.Lock()
        self._tpu = None
        if backend == "tpu":
            from .tpu_engine import TpuClassifier

            self._tpu = TpuClassifier(self.idx)

    def _new_backend(self, thread_num: int = 1):
        if self.backend_kind == "tpu":
            return self._tpu.new_session()
        if self.backend_kind == "native":
            from .native import NativeClassifier

            return NativeClassifier(self.idx, n_threads=max(1, thread_num))
        return OracleClassifier(self.idx)

    def _buff_for(self, thread_id: int, thread_num: int) -> _ThreadBuff:
        """find_and_init_buff_for_thread_mutex (cly_mt.c:1279-1307)."""
        with self._lock:
            b = self._buffs.get(thread_id)
            if b is not None and thread_num != -1 and b.thread_num != thread_num:
                b = None
            if b is None:
                b = _ThreadBuff(self, thread_num)
                self._buffs[thread_id] = b
            return b

    def read_classify(self, data, thread_id: int = 0, thread_num: int = 1,
                      output_seq: bool = True) -> str:
        """Classify a FASTQ path or in-memory bytes/str -> SAM_FULL text.

        Path mode = the C's input_n == -1 (desamba.h:16)."""
        if isinstance(data, str) and os.path.exists(data):
            reads_src = data
        else:
            reads_src = data.encode() if isinstance(data, str) else bytes(data)
            if len(reads_src) == 0:
                return ""
        buff = self._buff_for(thread_id, thread_num)
        out = []
        if hasattr(buff.backend, "classify_batch"):
            reads = [(r.name, r.seq, r.qual) for r in read_fastx(reads_src)]
            for res in buff.backend.classify_batch(reads):
                if getattr(res, "aborted", False):
                    continue  # the reference binary would crash on this read
                out.append(format_sam(self.idx, res, output_seq))
        else:
            for r in read_fastx(reads_src):
                res = buff.backend.classify_read(r.name, r.seq, r.qual)
                out.append(format_sam(self.idx, res, output_seq))
        return "".join(out)

    def meta_analysis(self, sam_text, thread_id: int = 0,
                      flag: int = META_USE_READ_NUM,
                      max_snapshot_len: int = MAX_HUMAN_SNAPSHOT_LEN):
        """SAM_FULL text -> (report, human_snapshot|None) (desamba.h:25-45)."""
        if isinstance(sam_text, bytes):
            sam_text = sam_text.decode()
        if not sam_text:
            return "", None
        self._buff_for(thread_id, -1)
        return _meta_analysis(sam_text, self.tax, flag, max_snapshot_len)
