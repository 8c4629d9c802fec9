"""CGR workloads: whole-sequence CGR and k-mer (oligo) CGR.

Reference behavior:
  * CgrComputer (composition/src/cgr.rs): one `(x,y)` point per base,
    lines of points joined by spaces, Rust `{}` f64 formatting; any
    base outside AaCcGgTtUu aborts with "Bad nucleotide".
  * OligoCgrComputer (composition/src/oligocgr.rs): for each canonical
    k-mer, the CGR endpoint of the k-mer string plus its (optionally
    normalised) per-read frequency as `(x,y,freq)`.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

from kmertools_tpu.io import batch as iob
from kmertools_tpu.io import fastx
from kmertools_tpu.ops import cgr as cgr_ops
from kmertools_tpu.ops import encode, histogram
from kmertools_tpu.utils import codec
from kmertools_tpu.utils.fmt import rust_f64_repr
from kmertools_tpu.workloads.common import OrderedEmitter, RowAggregator

_repr = functools.lru_cache(maxsize=1 << 16)(rust_f64_repr)

# whole reads up to this length run on-device; longer fall back to host
_CGR_ROW_WIDTHS = (128, 512, 2048, 8192, 32768)


# number of device cgr_scan dispatches this process (observability for
# tests asserting the device path actually ran)
DEVICE_SCAN_RUNS = 0


_F64_EXACT: bool | None = None


def _f64_supported() -> bool:
    """True iff the backend runs the CGR scan kernel BIT-EXACTLY in
    f64; ENABLES x64 if needed.

    The CGR walk needs exact IEEE f64 (the reference's per-step
    rounding is part of its output bytes, composition/src/cgr.rs:
    127-144), but JAX defaults to x64-off — so a plain CLI run would
    otherwise silently take the host loop forever. A dtype probe is
    NOT enough: TPU emulated f64 runs the elementwise ops correctly
    rounded yet drifts in the last ulp inside the scan, so the probe
    runs a real 64-step kernel against the host oracle and falls back
    on any mismatch. Set KMERTOOLS_NO_X64=1 to force the host path.
    """
    global _F64_EXACT
    if _F64_EXACT is not None:
        return _F64_EXACT
    import os

    import jax

    from kmertools_tpu.ops import cgr as cgr_ops

    if os.environ.get("KMERTOOLS_NO_X64"):
        _F64_EXACT = False
        return False
    if not jax.config.read("jax_enable_x64"):
        try:
            jax.config.update("jax_enable_x64", True)
        except Exception:
            _F64_EXACT = False
            return False
    try:
        codes = (np.arange(64) % 4).astype(np.uint8)[None, :]
        xs, ys = cgr_ops.cgr_scan(jnp.asarray(codes), 1.0, jnp.float64)
        xs = np.asarray(xs)[0]
        ys = np.asarray(ys)[0]
        cx = np.array([0.0, 0.0, 1.0, 1.0])
        cy = np.array([0.0, 1.0, 1.0, 0.0])
        hx = hy = 0.5
        for i, c in enumerate(codes[0]):
            hx = (hx + cx[c]) / 2.0
            hy = (hy + cy[c]) / 2.0
            if hx != xs[i] or hy != ys[i]:
                _F64_EXACT = False
                return False
        _F64_EXACT = True
        return True
    except Exception:
        _F64_EXACT = False
        return False


class CgrComputer:
    """Whole-sequence CGR (composition/src/cgr.rs:41-144)."""

    def __init__(self, in_path: str, out_path: str, vecsize: int):
        self.in_path = in_path
        self.out_path = out_path
        self.vecsize = vecsize
        self.threads = 0
        self.input_shard = None
        self.target_codes = iob.DEFAULT_TARGET_CODES

    def set_threads(self, threads: int) -> None:
        self.threads = threads

    def set_input_shard(self, shard) -> None:
        self.input_shard = shard

    def _points_host(self, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Sequential f64 walk for reads longer than the widest bucket."""
        s = float(self.vecsize)
        cx_t = np.array([0.0, 0.0, s, s], dtype=np.float64)
        cy_t = np.array([0.0, s, s, 0.0], dtype=np.float64)
        xs = np.empty(len(codes))
        ys = np.empty(len(codes))
        x = y = s / 2.0
        for i, c in enumerate(codes):
            x = (x + cx_t[c]) / 2.0
            y = (y + cy_t[c]) / 2.0
            xs[i] = x
            ys[i] = y
        return xs, ys

    def vectorise(self) -> None:
        use_device = _f64_supported()
        if self.input_shard is not None:
            from kmertools_tpu.parallel import dataflow

            records = dataflow.shard_sequences(self.in_path, self.input_shard)
        else:
            records = fastx.sequences(self.in_path)

        def _format_native(payloads: list):
            """One chunk -> output bytes via kt_format_cgr (GIL-free),
            or None when the native runtime is unavailable."""
            from kmertools_tpu import native

            so = native.lib()
            if so is None:
                return None
            import ctypes

            lens = np.array([len(xs) for xs, _ in payloads], dtype=np.int32)
            stride = int(lens.max()) if len(lens) else 0
            if not stride:
                # all-empty sequences render as empty lines; returning
                # None here would throw away the sibling chunks' native
                # output and push the whole block onto the Python path
                return np.frombuffer(b"\n" * len(payloads), dtype=np.uint8)
            fx = np.empty((len(payloads), stride), dtype=np.float64)
            fy = np.empty((len(payloads), stride), dtype=np.float64)
            for i, (xs, ys) in enumerate(payloads):
                fx[i, : len(xs)] = xs
                fy[i, : len(ys)] = ys
            cap = int(lens.sum()) * 64 + len(payloads) * 2 + 64
            while True:
                arr, buf = native.out_buf(cap)
                n = so.kt_format_cgr(
                    fx.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    fy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    lens.ctypes.data_as(native.c_i32_p),
                    len(payloads), stride, buf, cap,
                )
                if n >= 0:
                    return arr[:n]
                cap *= 4  # rare deep-walk denormal expansion

        import concurrent.futures as _cf

        pool = _cf.ThreadPoolExecutor(max_workers=min(4, os.cpu_count() or 1))

        def write_block(payloads: list) -> None:
            # the format kernel releases the GIL, so chunks of the
            # block format in parallel; writes stay in block order
            if payloads and len(payloads) >= 128:
                step = (len(payloads) + 3) // 4
                chunks = [
                    payloads[s : s + step]
                    for s in range(0, len(payloads), step)
                ]
                parts = list(pool.map(_format_native, chunks))
                if all(p is not None for p in parts):
                    for p in parts:
                        out.write(p.tobytes())
                    return
            elif payloads:
                p = _format_native(payloads)
                if p is not None:
                    out.write(p.tobytes())
                    return
            lines = []
            for xs, ys in payloads:
                lines.append(
                    " ".join(f"({_repr(x)},{_repr(y)})" for x, y in zip(xs, ys))
                )
            out.write(("\n".join(lines) + "\n").encode())

        with pool, open(self.out_path, "wb") as out:
            emitter = OrderedEmitter(write_block, block=1024)
            max_w = _CGR_ROW_WIDTHS[-1]

            def records_filtered():
                for rec in records:
                    if len(rec.seq) > max_w:
                        codes = iob.encode_bases(rec.seq)
                        self._check_codes(codes, rec.id)
                        emitter.add(rec.n, self._points_host(codes))
                    else:
                        yield rec

            for b in iob.batch_stream(
                records_filtered(),
                overlap=0,
                row_widths=_CGR_ROW_WIDTHS,
                target_codes=self.target_codes,
            ):
                lens = b.lengths
                for i in np.nonzero(b.read_idx >= 0)[0]:
                    self._check_codes(
                        b.codes[i, : lens[i]], b.ids.get(int(b.read_idx[i]), "?")
                    )
                if use_device:
                    global DEVICE_SCAN_RUNS
                    DEVICE_SCAN_RUNS += 1
                    xs, ys = cgr_ops.cgr_scan(
                        jnp.asarray(b.codes), float(self.vecsize), jnp.float64
                    )
                    xs = np.asarray(xs)
                    ys = np.asarray(ys)
                else:
                    full = np.empty(
                        (b.codes.shape[0], b.codes.shape[1], 2), dtype=np.float64
                    )
                    s = float(self.vecsize)
                    cx_t = np.array([0.0, 0.0, s, s, 0.0])
                    cy_t = np.array([0.0, s, s, 0.0, 0.0])
                    m = np.full((b.codes.shape[0], 2), s / 2.0)
                    for t in range(b.codes.shape[1]):
                        m = (m + np.stack(
                            [cx_t[b.codes[:, t]], cy_t[b.codes[:, t]]], axis=1
                        )) / 2.0
                        full[:, t] = m
                    xs, ys = full[..., 0], full[..., 1]
                for i in np.nonzero(b.read_idx >= 0)[0]:
                    n = int(lens[i])
                    emitter.add(int(b.read_idx[i]), (xs[i, :n], ys[i, :n]))
            emitter.finish()

    @staticmethod
    def _check_codes(codes: np.ndarray, rid: str) -> None:
        if (codes >= 4).any():
            raise ValueError("Bad nucleotide, unable to proceed")


class OligoCgrComputer:
    """k-mer CGR (composition/src/oligocgr.rs:16-163)."""

    def __init__(self, in_path: str, out_path: str, ksize: int, vecsize: int):
        self.in_path = in_path
        self.out_path = out_path
        self.ksize = ksize
        self.vecsize = vecsize
        self.norm = True
        self.threads = 0
        self.input_shard = None
        self.target_codes = iob.DEFAULT_TARGET_CODES
        _, pos_kmer, self.kcount = codec.kmer_pos_maps(ksize)
        kmer_vals = np.array([pos_kmer[i] for i in range(self.kcount)], dtype=np.uint64)
        digits = np.empty((self.kcount, ksize), dtype=np.int64)
        for j in range(ksize):
            digits[:, j] = ((kmer_vals >> np.uint64(2 * (ksize - 1 - j))) & np.uint64(3)).astype(np.int64)
        self._xs, self._ys = cgr_ops.kmer_cgr_points(digits, float(vecsize))
        self._prefixes = [
            f"({rust_f64_repr(x)},{rust_f64_repr(y)}," for x, y in zip(self._xs, self._ys)
        ]

    def set_threads(self, threads: int) -> None:
        self.threads = threads

    def set_norm(self, norm: bool) -> None:
        self.norm = norm

    def set_input_shard(self, shard) -> None:
        self.input_shard = shard

    def _emit_slab(self, out, vecs: np.ndarray, tots: np.ndarray) -> None:
        freqs = vecs.astype(np.float64)
        if self.norm:
            freqs = freqs / np.maximum(1.0, tots.astype(np.float64))[:, None]
        from kmertools_tpu import native

        so = native.lib()
        if so is not None:
            import ctypes

            if not hasattr(self, "_prefix_blob"):
                parts = [p.encode() + b"\0" for p in self._prefixes]
                off = np.zeros(len(parts), dtype=np.int32)
                pos = 0
                for i, part in enumerate(parts):
                    off[i] = pos
                    pos += len(part)
                self._prefix_blob = b"".join(parts)
                self._prefix_off = off
            freqs = np.ascontiguousarray(freqs)
            nrows, ncols = freqs.shape
            cap = nrows * (len(self._prefix_blob) + ncols * 32) + nrows * 2 + 64
            while True:
                arr, buf = native.out_buf(cap)
                n = so.kt_format_oligocgr(
                    self._prefix_blob,
                    self._prefix_off.ctypes.data_as(native.c_i32_p),
                    ncols,
                    freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    nrows, buf, cap,
                )
                if n >= 0:
                    out.write(arr[:n].tobytes())
                    return
                cap *= 4
        lines = []
        for row in freqs:
            lines.append(
                " ".join(
                    p + _repr(float(f)) + ")"
                    for p, f in zip(self._prefixes, row)
                )
            )
        out.write(("\n".join(lines) + "\n").encode())

    def vectorise(self) -> None:
        from kmertools_tpu.ops import pallas_histogram
        from kmertools_tpu.workloads.common import (
            ArrayAggregator,
            OrderedArrayEmitter,
            data_parallel_step,
            run_pipelined,
        )

        slot_table = jnp.asarray(codec.canonical_slot_table(self.ksize))
        use_pallas = pallas_histogram.use_pallas()
        if use_pallas:
            bin_values = jnp.asarray(codec.canonical_bin_values(self.ksize))

        def device_step(codes):
            fwd, rc, valid = encode.kmer_ids_small(codes, self.ksize)
            ids = jnp.minimum(fwd, rc)
            if use_pallas:
                return pallas_histogram.per_read_histogram_tpu(
                    ids.astype(jnp.int32), valid, bin_values, self.kcount
                )
            if histogram.prefer_scatter():
                slots = jnp.take(
                    slot_table, jnp.where(valid, ids, 0), mode="clip"
                )
                counts, totals = histogram.per_read_histogram_scatter(
                    slots.astype(jnp.int32), valid, self.kcount
                )
            else:
                counts, totals = histogram.per_read_histogram_gathered(
                    ids, valid, slot_table, self.kcount
                )
            return counts.astype(jnp.int16), totals.astype(jnp.int32)

        with open(self.out_path, "wb") as out:
            emitter = OrderedArrayEmitter(
                lambda vecs, tots: self._emit_slab(out, vecs, tots)
            )
            agg = ArrayAggregator(self.kcount)

            def consume(meta, counts, totals) -> None:
                ridx, vecs, tots = agg.add_batch(
                    meta.read_idx, meta.last_row,
                    np.asarray(counts), np.asarray(totals),
                )
                emitter.add(ridx, vecs, tots)

            sharded_step = data_parallel_step(device_step)
            run_pipelined(
                iob.stream_path(
                    self.in_path,
                    overlap=self.ksize - 1,
                    target_codes=self.target_codes,
                    shard=self.input_shard,
                ),
                lambda b: sharded_step(jnp.asarray(b.codes)),
                consume,
            )
            agg.finish()
            emitter.finish()
