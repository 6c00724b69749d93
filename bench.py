#!/usr/bin/env python
"""Benchmark: variants/sec/chip for the parse+encode path + auxiliary stages.

Prints ONE JSON line whose headline is
  {"metric": "variants/sec/chip (parse+encode)", "value": N,
   "unit": "variants/sec", "vs_baseline": N / 559390, ...extras}

Baseline: the reference's published single-core htslib parse throughput
(559,390 variants/sec — reference README.md:118).  "parse+encode" is the
full replacement path: multithreaded native framing (libdeflate BGZF decode
+ v2 compact record framing) -> host->device transfer -> jit decode kernel
(POS delta-chain reconstruction, SNP predicate, genotype/phase decode).

Honesty on a caching execution relay: every timed device iteration uploads
freshly MUTATED content (the relay elides re-execution of identical
computations on identical buffers — verified at 148x physical peak FLOPs
when violated), and the sampler stage feeds a fresh host-built PRNG key per
iteration.

Extra stages (all reported in the JSON line):
  - cohort mode: all donors extracted in ONE pass (v2 multi-sample framing)
  - Pallas vs XLA decode shoot-out on the 12-byte kernel (VERDICT r1 #8)
  - whole-genome config: 3M-variant VCF -> cohort HDF5 end-to-end including
    Blosc write + merge (reference: ~6s parse + ~12s write, README.md:123)
  - sampler windows/sec (codes mode + one-hot mode)
  - storage write/read/ratio/random-slices

Runs on whatever accelerator JAX finds (real TPU under the driver; CPU
elsewhere).  Details go to stderr; the JSON line is the last stdout line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_VARIANTS_PER_SEC = 559_390
BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data")
# Persistent XLA compilation cache: kernel compiles survive across worker
# subprocesses and bench runs (a cold decode-kernel compile on a degraded
# relay was measured at 93s — cache-warm it once, never pay again).  Must
# be set before the first jax import anywhere in this process.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
N_VARIANTS = int(os.environ.get("HH_BENCH_VARIANTS", 2_000_000))
N_SAMPLES = 3
WG_VARIANTS = int(os.environ.get("HH_BENCH_WG_VARIANTS", 3_000_000))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def stats(ts: list[float]) -> dict:
    """Median/IQR/best of a timing sample (seconds).  Median is the
    decision statistic everywhere (the tunneled link shows 30x run-to-run
    spread, so best-of is noise-prone); best is kept as a secondary."""
    a = np.asarray(sorted(ts), dtype=np.float64)
    q1, med, q3 = np.percentile(a, [25, 50, 75])
    return {
        "n": len(ts),
        "median_s": round(float(med), 5),
        "iqr_s": round(float(q3 - q1), 5),
        "best_s": round(float(a[0]), 5),
    }


def fmt_stats(s: dict) -> str:
    return (
        f"median {s['median_s']:.4f}s IQR {s['iqr_s']:.4f}s "
        f"best {s['best_s']:.4f}s (n={s['n']})"
    )


#: timed iterations per stage (VERDICT r2 #3: >=10 for defensible medians)
N_ITERS = int(os.environ.get("HH_BENCH_ITERS", 10))

#: per-stage deadline (VERDICT r4 #1): the stage loop sets this before each
#: stage; stage bodies consult stage_time_left() to shrink their iteration /
#: fused-batch counts so ONE slow-dispatch relay mood cannot starve every
#: stage behind it.  A thread-join backstop in the stage loop enforces the
#: cap even on a stage that never checks.
_STAGE = {"deadline": float("inf")}

#: cross-stage hints (e.g. the windows stage marks the relay's slow-
#: per-dispatch mood so the shoot-out that follows right sizes itself)
_HINTS: dict = {}


def stage_time_left() -> float:
    return _STAGE["deadline"] - time.time()


def device_health(timeout_s: float = 45.0, retries: int = 2) -> tuple[bool, bool]:
    """Probe device execute (in-process) and device->host transfer (in a
    SUBPROCESS).  Returns ``(exec_ok, d2h_ok)``.

    The d2h probe must not run in this process: on a relayed TPU a wedged
    device_get hangs its thread while holding client state, and every
    subsequent transfer in the process degrades (round-2 runs measured the
    8ms upload+decode path at 235-540ms after an in-process probe wedged).
    A killed subprocess leaves the relay clean for the next client."""
    import subprocess
    import threading

    # --- d2h probe subprocess launches FIRST (non-blocking) so its cold
    # jax bring-up overlaps the in-process exec probe below.  A probe
    # TIMEOUT is definitive (it already waited timeout_s with a warm
    # compilation cache); only a quick non-zero exit earns a retry.
    d2h_proc = subprocess.Popen(
        [
            sys.executable,
            "-c",
            # repin like main(): sitecustomize overrides JAX_PLATFORMS,
            # so a cpu-fallback worker's probe must not test the TPU
            "import os, jax;"
            "os.environ.get('JAX_PLATFORMS') == 'cpu' and"
            " jax.config.update('jax_platforms', 'cpu');"
            "import numpy as np;"
            "x = jax.jit(lambda a: a * 2)(jax.numpy.arange(16));"
            "assert int(np.asarray(jax.device_get(x))[1]) == 2",
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env=dict(os.environ),
    )
    d2h_t0 = time.time()

    # --- exec probe (no d2h anywhere on this path) -----------------------
    exec_seen = False
    for attempt in range(retries):
        state = {"exec": False}

        def probe():
            try:
                import jax
                import jax.numpy as jnp

                x = jnp.arange(16) * 2
                jax.block_until_ready(x)
                state["exec"] = True
            except Exception as exc:
                log(f"device probe exception: {exc}")

        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(timeout=timeout_s)
        exec_seen = exec_seen or state["exec"]
        if state["exec"]:
            break
        log(f"device exec probe attempt {attempt + 1}/{retries}: failed")
        if attempt < retries - 1:
            time.sleep(5)
    if not exec_seen:
        log("WARNING: device cannot execute; caller should fall back to CPU")

    # --- join the overlapped d2h probe -----------------------------------
    d2h_ok = False
    try:
        remaining = max(1.0, timeout_s - (time.time() - d2h_t0))
        rc = d2h_proc.wait(timeout=remaining)
        if rc == 0:
            d2h_ok = True
        else:  # quick failure (not a stall): one retry is cheap
            try:
                rc = subprocess.run(
                    [
                        sys.executable,
                        "-c",
                        "import os, jax;"
                        "os.environ.get('JAX_PLATFORMS') == 'cpu' and"
                        " jax.config.update('jax_platforms', 'cpu');"
                        "import numpy as np;"
                        "x = jax.jit(lambda a: a * 2)(jax.numpy.arange(16));"
                        "assert int(np.asarray(jax.device_get(x))[1]) == 2",
                    ],
                    timeout=timeout_s,
                    capture_output=True,
                    env=dict(os.environ),
                ).returncode
                d2h_ok = rc == 0
            except subprocess.TimeoutExpired:
                pass
    except subprocess.TimeoutExpired:
        log(f"d2h probe timed out ({timeout_s:.0f}s)")
        d2h_proc.kill()
        try:
            d2h_proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            pass
    if not d2h_ok:
        log("WARNING: device->host transfer unhealthy; skipping d2h-dependent stages")
    return exec_seen, d2h_ok



def _d2h_probe_once(timeout_s: float = 30.0) -> bool:
    """One subprocess d2h probe (see device_health for why a subprocess)."""
    import subprocess

    try:
        return (
            subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import os, jax;"
                    "os.environ.get('JAX_PLATFORMS') == 'cpu' and"
                    " jax.config.update('jax_platforms', 'cpu');"
                    "import numpy as np;"
                    "x = jax.jit(lambda a: a * 2)(jax.numpy.arange(16));"
                    "assert int(np.asarray(jax.device_get(x))[1]) == 2",
                ],
                timeout=timeout_s,
                capture_output=True,
                env=dict(os.environ),
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def bgzf_write(path: str, text: bytes, level: int = 1) -> None:
    """Write bytes as BGZF (64KB gzip blocks with BC extra field) so the
    native reader can decompress blocks in parallel — the real-world format
    of bcftools-produced ``.vcf.gz`` cohort files."""
    from haplohyped_tpu.hostio.bgzf import bgzf_write as _bw

    _bw(path, text, level=level, threads=min(8, os.cpu_count() or 1))


def _make_vcf(
    path: str,
    n_variants: int,
    samples: list[str],
    seed: int = 0,
    chrom: str = "chr1",
    gap: tuple[int, int] = (50, 200),
    contig_len: int = 800_000_000,
    with_ids: bool = True,
) -> None:
    """Vectorized synthetic BGZF VCF writer — the single corpus generator
    shared by bench.py and benchmarks/scaling.py (one format authority:
    a GT-layout or header fix lands in both benchmark families)."""
    rng = np.random.default_rng(seed)
    t0 = time.time()
    bases = np.array(list("ACGT"))
    positions = np.cumsum(rng.integers(*gap, size=n_variants)) + 10_000
    refs = bases[rng.integers(0, 4, size=n_variants)]
    alt_off = rng.integers(1, 4, size=n_variants)
    alts = bases[(np.searchsorted(bases, refs) + alt_off) % 4]
    gts = np.array(["0|0", "0|1", "1|0", "1|1"])[
        rng.integers(0, 4, size=(n_variants, len(samples)))
    ]
    parts = [
        "##fileformat=VCFv4.2\n"
        f"##contig=<ID={chrom},length={contig_len}>\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(samples)
        + "\n"
    ]
    CHUNK = 100_000
    for lo in range(0, n_variants, CHUNK):
        hi = min(lo + CHUNK, n_variants)
        rows = [
            f"{chrom}\t{positions[i]}\t{f'rs{i}' if with_ids else '.'}\t"
            f"{refs[i]}\t{alts[i]}\t.\tPASS\t.\tGT\t"
            + "\t".join(gts[i])
            for i in range(lo, hi)
        ]
        parts.append("\n".join(rows) + "\n")
    bgzf_write(path, "".join(parts).encode())
    log(f"corpus {path}: {n_variants} variants in {time.time() - t0:.1f}s")


def ensure_corpus() -> tuple[str, str]:
    """Generate (once) a large synthetic single-chrom BGZF VCF + sample."""
    os.makedirs(BENCH_DIR, exist_ok=True)
    vcf = os.path.join(BENCH_DIR, f"bench_chr1_{N_VARIANTS}.bgzf.vcf.gz")
    sample = "bench-sample-0000"
    if not os.path.exists(vcf):
        log(f"generating bench corpus: {N_VARIANTS} variants ...")
        _make_vcf(vcf, N_VARIANTS, [f"bench-sample-{i:04d}" for i in range(N_SAMPLES)])
    return vcf, sample


def ensure_wg_corpus() -> str:
    """Whole-genome-scale config: 3M variants, 1 sample, converter layout
    (``{dir}/chr1.filtered.vcf.gz`` + samples.txt)."""
    d = os.path.join(BENCH_DIR, f"wg_{WG_VARIANTS}")
    vcf = os.path.join(d, "chr1.filtered.vcf.gz")
    if not os.path.exists(vcf):
        os.makedirs(d, exist_ok=True)
        log(f"generating whole-genome corpus: {WG_VARIANTS} variants ...")
        _make_vcf(vcf, WG_VARIANTS, ["wg-sample-0000"], seed=2)
        with open(os.path.join(d, "samples.txt"), "w") as f:
            f.write("wg-sample-0000\n")
    return d


# ---------------------------------------------------------------------
# stage: parse+encode headline (v2 single-sample)
# ---------------------------------------------------------------------


def _upload_decode_v2(frame, dev, mutate_byte: int):
    """One honest upload+decode: mutates one fixed byte so a caching relay
    must re-execute, ships all six v2 buffers, runs the jit kernel."""
    import jax

    from haplohyped_tpu.ops.vcf_decode import decode_frames_v2, pad_v2_sides

    f = frame.fixed.copy()
    f[mutate_byte % frame.n, 2] ^= 1  # REF char bit: content differs
    ei, ep, rc, ri = pad_v2_sides(frame)
    out = decode_frames_v2(
        jax.device_put(f, dev),
        jax.device_put(frame.gt, dev),
        jax.device_put(ei, dev),
        jax.device_put(ep, dev),
        jax.device_put(rc, dev),
        jax.device_put(ri, dev),
    )
    return out


def bench_parse_encode(
    vcf: str, sample: str, threads: int, with_d2h: bool = True
) -> tuple[int, float]:
    """Primary path: native v2 framing -> upload -> jit decode kernel.

    Measures (a) staged host+device and (b) pipelined steady state (host
    framing of task k+1 overlapped with device decode of task k — the
    converter's behavior across chromosome tasks).  Returns
    (n_variants, best_e2e_seconds_per_task).
    """
    import queue
    import threading

    import jax

    from haplohyped_tpu.hostio import native

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # --- host stage: BGZF decode + v2 framing ---------------------------
    host_s = []
    frame = None
    for _ in range(max(5, N_ITERS // 2)):
        t0 = time.time()
        frame = native.vcf_frame_v2(vcf, sample, None, threads=threads)
        host_s.append(time.time() - t0)
    hst = stats(host_s)
    host_med = hst["median_s"]
    n = frame.n
    log(
        f"host decompress+frame_v2: {fmt_stats(hst)} for {n} records "
        f"({frame.wire_bytes() / 1e6:.0f} MB wire), chroms={frame.chroms}"
    )

    # --- compile --------------------------------------------------------
    t0 = time.time()
    out = _upload_decode_v2(frame, dev, 0)
    jax.block_until_ready(out)
    log(f"upload+decode compile+first run: {time.time() - t0:.1f}s")

    # --- upload + device decode (mutated content each iteration) --------
    dev_s = []
    for i in range(N_ITERS):
        t0 = time.time()
        out = _upload_decode_v2(frame, dev, i + 1)
        jax.block_until_ready(out)
        dev_s.append(time.time() - t0)
    dst = stats(dev_s)
    dev_med = dst["median_s"]
    snps = (
        f"{int(np.asarray(out['snp_mask'])[:n].sum())} SNPs"
        if with_d2h
        else "d2h skipped"
    )
    log(
        f"upload+decode: {fmt_stats(dst)} "
        f"= {n / dev_med:,.0f} variants/s at median ({snps})"
    )

    staged = host_med + dev_med
    log(
        f"staged parse+encode: {n} variants in {staged:.3f}s "
        f"(host median {host_med:.3f} + upload+device median {dev_med:.3f}) "
        f"= {n / staged:,.0f} variants/s"
    )
    _PARTIAL["parse_encode_stats"] = {"host": hst, "upload_decode": dst}
    # a real measurement exists from here on: let the watchdog emit it if
    # the pipelined stage wedges
    _PARTIAL.setdefault("value", round(n / staged))

    # --- pipelined steady state: producer thread frames task k+1 AND
    # starts its upload while the device decodes task k (3-stage overlap:
    # frame / h2d / decode — the converter's behavior across chromosome
    # tasks).  Each frame call yields fresh buffers; one byte is mutated
    # per task so a caching relay must re-ship and re-execute. -----------
    from haplohyped_tpu.ops.vcf_decode import decode_frames_v2, pad_v2_sides

    rounds = 7
    q: queue.Queue = queue.Queue(maxsize=2)

    def producer():
        for k in range(rounds):
            fr = native.vcf_frame_v2(vcf, sample, None, threads=threads)
            fr.fixed[(k + 100) % fr.n, 2] ^= 1  # content differs per task
            ei, ep, rcnt, rid = pad_v2_sides(fr)
            bufs = [
                jax.device_put(a, dev)
                for a in (fr.fixed, fr.gt, ei, ep, rcnt, rid)
            ]
            q.put(bufs)
        q.put(None)

    t0 = time.time()
    th = threading.Thread(target=producer, daemon=True)
    th.start()
    outs = []
    while True:
        item = q.get()
        if item is None:
            break
        outs.append(decode_frames_v2(*item))
    jax.block_until_ready(outs)
    th.join()
    pipe = (time.time() - t0) / rounds
    log(
        f"pipelined parse+encode ({rounds} tasks overlapped): "
        f"{pipe:.3f}s/task = {n / pipe:,.0f} variants/s"
    )

    best = min(staged, pipe)
    log(f"end-to-end parse+encode best: {n / best:,.0f} variants/s")
    return n, best


# ---------------------------------------------------------------------
# stage: cohort mode (all donors, one pass)
# ---------------------------------------------------------------------


def bench_cohort(vcf: str, threads: int) -> float:
    """All N_SAMPLES donors extracted in ONE framing pass + one decode —
    the single-pass converter's steady state.  Returns donor-variants/sec
    (records x donors per second of end-to-end work)."""
    import jax

    from haplohyped_tpu.hostio import native

    dev = jax.devices()[0]
    t0 = time.time()
    frame = native.vcf_frame_v2(vcf, "*", None, threads=threads)
    host_s = time.time() - t0
    out = _upload_decode_v2(frame, dev, 0)  # compile
    jax.block_until_ready(out)
    ts = []
    for i in range(3):
        t0 = time.time()
        fr = native.vcf_frame_v2(vcf, "*", None, threads=threads)
        out = _upload_decode_v2(fr, dev, i + 1)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    best = min(ts)
    dvps = frame.n * frame.n_samples / best
    log(
        f"cohort mode ({frame.n_samples} donors, one pass): host {host_s:.3f}s; "
        f"e2e best {best:.3f}s = {dvps:,.0f} donor-variants/s "
        f"({frame.wire_bytes() / 1e6:.0f} MB wire for all donors)"
    )
    return dvps


# ---------------------------------------------------------------------
# stage: Pallas vs XLA decode shoot-out (12-byte kernel)
# ---------------------------------------------------------------------


def bench_shootout(vcf: str, sample: str, threads: int) -> dict:
    """Head-to-head on-chip: XLA jit decode_frames12 vs the Pallas 12-byte
    kernel, identical inputs, mutated per iteration.  MEDIAN of N_ITERS
    decides (VERDICT r2 #3: 4-iteration best-of flipped the verdict vs the
    median on this noisy link).  Returns {"xla": {...}, "pallas": {...},
    "winner": name}."""
    import jax

    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.ops.pallas_decode import B12_REC, _pallas_decode12_call
    from haplohyped_tpu.ops.vcf_decode import decode_frames12

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        log("decode12 shoot-out: pallas skipped on CPU (interpret-only, not a measurement)")
    rec, chroms, _ = native.vcf_frame12(vcf, sample, None, threads=threads)
    n = rec.shape[0]
    n_pad = max(-(-n // B12_REC) * B12_REC, B12_REC)
    rec_pad = np.zeros((n_pad, 12), np.uint8)
    rec_pad[:n] = rec

    def run_xla(i):
        r = rec.copy()
        r[i % n, 5] ^= 1
        out = decode_frames12(jax.device_put(r, dev))
        jax.block_until_ready(out)

    def run_pallas(i):
        r = rec_pad.copy()
        r[i % n, 5] ^= 1
        out = _pallas_decode12_call(jax.device_put(r, dev), True)
        jax.block_until_ready(out)

    pairs = [("xla", run_xla)]
    if dev.platform != "cpu":
        pairs.append(("pallas", run_pallas))
    results = {}
    for name, fn in pairs:
        try:
            t0 = time.time()
            fn(0)  # compile
            log(f"decode12 {name}: compile+first run {time.time() - t0:.1f}s")
            ts = []
            for i in range(N_ITERS):
                t0 = time.time()
                fn(i + 1)
                ts.append(time.time() - t0)
            st = stats(ts)
            results[name] = {"vps": round(n / st["median_s"]), **st}
            log(
                f"decode12 {name}: {fmt_stats(st)} "
                f"= {results[name]['vps']:,.0f} variants/s at median (upload+decode)"
            )
        except Exception as exc:
            log(f"decode12 {name} failed: {exc}")
            results[name] = {"vps": 0, "error": str(exc)[:200]}
    winner = max(results, key=lambda k: results[k]["vps"])
    results["winner"] = winner
    log(f"decode12 winner at median: {winner}")
    return results


# ---------------------------------------------------------------------
# stage: device-resident decode roofline (no H2D in the timed region)
# ---------------------------------------------------------------------

#: v5e (v5 lite) peak HBM bandwidth, bytes/s
V5E_HBM_BYTES_PER_S = 819e9

#: v5e peak bf16 matmul throughput, FLOP/s (the MFU denominator)
V5E_BF16_FLOPS_PER_S = 197e12


def bench_device_roofline(vcf: str, sample: str, threads: int) -> dict:
    """Kernel-only decode throughput with input ALREADY on device: how far
    the decode kernel itself sits from speed-of-light HBM bandwidth
    (BASELINE.json north star).  The timed computation flips one device
    byte per iteration (jit-traced, index fed as a device scalar) so a
    caching relay must re-execute, but no host->device transfer of the
    record buffer happens inside the timed region."""
    import functools

    import jax
    import jax.numpy as jnp

    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.ops.vcf_decode import decode_frames12

    dev = jax.devices()[0]
    rec, chroms, _ = native.vcf_frame12(vcf, sample, None, threads=threads)
    # 8x the corpus: at 2M records both kernels finish in ~0.1ms — the
    # dispatch floor — so the measured "bandwidth" was mostly overhead;
    # 16M records (192 MB in + outputs) gives the kernel real signal
    rec = np.ascontiguousarray(np.tile(rec, (8, 1)))
    n = rec.shape[0]

    #: name -> (fn taking the carried buffer, carried buffer host-side,
    #:          input bytes per decode, record axis of the carry)
    kernels: dict = {"xla": (lambda r: decode_frames12(r), rec, 12 * n, 0)}
    if jax.default_backend() == "tpu":
        from haplohyped_tpu.ops.pallas_decode import B12_REC, _pallas_decode12_call

        # the converter's TPU production kernel — measure what ships;
        # pad the record axis to the kernel's grid block
        n_pad = max(-(-n // B12_REC) * B12_REC, B12_REC)
        rec_p = rec
        if n_pad != n:
            rec_p = np.vstack([rec, np.zeros((n_pad - n, 12), np.uint8)])
        kernels["pallas"] = (
            lambda r: _pallas_decode12_call(r, True), rec_p, 12 * n_pad, 0
        )

    # struct-of-arrays layout: (12, N) byte planes — every column access
    # is a dense full-lane vector instead of a 12-of-128-lane strided
    # gather (the row layout's ~10.7x tile amplification)
    from haplohyped_tpu.ops.vcf_decode import decode_frames12_packed, decode_planes12

    kernels["planes"] = (
        lambda r: decode_planes12(r), np.ascontiguousarray(rec.T), 12 * n, 1
    )
    # the PRODUCTION decode (vcf_to_h5._decode12): XLA decode + packed
    # 3-int32 output (12 B/record on both HBM writes and the d2h leg)
    kernels["packed"] = (
        lambda r: decode_frames12_packed(r), rec, 12 * n, 0
    )

    # the v2 kernel (the single-pass converter's production decode): carry
    # the 5-byte fixed matrix; gt + side arrays are device-resident
    # closure constants (they're read every decode — counted in in_bytes)
    from haplohyped_tpu.hostio import native as _nat
    from haplohyped_tpu.ops.vcf_decode import decode_frames_v2, pad_v2_sides

    fr = _nat.vcf_frame_v2(vcf, sample, None, threads=threads)
    t8 = 8 if fr.n * 8 <= 20_000_000 else max(1, 20_000_000 // max(fr.n, 1))
    fx = np.ascontiguousarray(np.tile(fr.fixed, (t8, 1)))
    gtv = np.ascontiguousarray(np.tile(fr.gt, (t8, 1)))
    n2 = fx.shape[0]
    ei, ep, rc, ri = pad_v2_sides(fr)
    # re-anchor escapes only exist in the first tile; harmless for a
    # bandwidth measurement (identical arithmetic either way)
    gt_dev = jax.device_put(gtv, dev)
    sides_dev = tuple(jax.device_put(a, dev) for a in (ei, ep, rc, ri))
    kernels["v2"] = (
        lambda r: decode_frames_v2(r, gt_dev, *sides_dev),
        fx,
        (5 + gtv.shape[1]) * n2,
        0,
    )

    # The relay elides repeat executions aggressively: fresh index scalars,
    # content-fresh chained buffers, and even block_until_ready on a
    # data-dependent scan all came back at implied 200-6000% of HBM peak —
    # in its bad mood the relay acks readiness without executing ANYTHING.
    # The only timing it cannot fake: a device->host fetch of a value the
    # computation must produce.  So: ONE dispatch runs a lax.scan of CHAIN
    # decodes (step k+1's input depends on step k's output — serial by
    # construction), and the timed region ends with a 1-element d2h from
    # the final state.  The scalar fetch inflates the per-decode time by
    # RPC-latency/CHAIN, so the reported bandwidth is a LOWER bound.
    import jax.tree_util as jtu
    from jax import lax

    CHAIN = 64

    # production kernels first (packed = the converter's shipping decode,
    # v2 = the single-pass converter's decode): a stage-cap hit mid-loop
    # costs the research kernels' rows, never the shipping numbers
    order = ["packed", "v2", "xla", "planes", "pallas"]
    kernels = {k: kernels[k] for k in order if k in kernels}

    result: dict = {}

    # --- HBM calibration FIRST (r4 #1: cheapest-verified-first within the
    # stage too — the denominator every kernel is judged against must exist
    # even if a stage cap lands mid-loop).  VERDICT r4 #4 resolved: the old
    # single-chain ``c ^ 1`` calibration reported 205 GB/s = 25% of peak,
    # but that number was an ARTIFACT — the rig charges a ~26 ms fixed
    # dispatch+fetch cost per chained call, and 32 steps x 128 MB is only
    # ~10 ms of ideal work behind it (and a chain of ^1 steps is the
    # identity for even lengths, so the relay can elide it outright).  The
    # fix (tools/hbm_sweep.py, benchmarks/hbm_calibration.json): xorshift
    # steps (nonlinear, never fold, content-fresh every step) at TWO chain
    # lengths; the slope (t_long - t_short) / (n_long - n_short) is the
    # true per-step time with the fixed cost split out.  Measured this
    # way the rig sustains ~654 GB/s = 80% of the 819 GB/s paper peak.
    CAL_SHORT, CAL_LONG = 16, 96
    cal = np.zeros((256 << 20,), np.uint8)

    def _cal_chain(length):
        @jax.jit
        def chain_cal(r):
            def body(c, _):
                c = c ^ (c << 3)
                c = c ^ (c >> 5)
                return c ^ (c << 1), ()

            out, _ = lax.scan(body, r, None, length=length)
            return out

        return chain_cal

    cal_gbps = 0.0
    try:
        totals = {}
        cbuf = jax.device_put(cal, dev)
        for length in (CAL_SHORT, CAL_LONG):
            fn = _cal_chain(length)
            cbuf = fn(cbuf)  # compile
            int(np.asarray(cbuf[0]))
            cts = []
            for _ in range(3):
                t0 = time.time()
                cbuf = fn(cbuf)
                _ = int(np.asarray(cbuf[0]))
                cts.append(time.time() - t0)
            totals[length] = float(np.median(cts))
        per_step = (totals[CAL_LONG] - totals[CAL_SHORT]) / (CAL_LONG - CAL_SHORT)
        fixed_cost = totals[CAL_SHORT] - CAL_SHORT * per_step
        cal_gbps = 2 * cal.nbytes / max(per_step, 1e-9) / 1e9
        cal_frac = cal_gbps * 1e9 / V5E_HBM_BYTES_PER_S
        log(
            f"HBM calibration (xorshift, slope over chains "
            f"{CAL_SHORT}/{CAL_LONG}): {cal_gbps:.1f} GB/s = "
            f"{cal_frac * 100:.1f}% of v5e peak "
            f"(fixed dispatch+fetch cost {fixed_cost * 1e3:.1f} ms/call)"
        )
        result["hbm_calibration"] = {
            "gb_per_sec": round(cal_gbps, 2),
            "hbm_peak_fraction": round(cal_frac, 4),
            "fixed_cost_s": round(fixed_cost, 5),
            "per_step_s": round(per_step, 6),
            "method": "xorshift-slope",
        }
        del cbuf
    except Exception as exc:
        log(f"HBM calibration failed: {exc}")

    measured_one = False
    for name, (fn, carry_host, in_bytes, rec_axis) in kernels.items():
        if measured_one and stage_time_left() < 8:
            result[name] = {"note": "stage cap hit"}
            continue
        carry_dev = jax.device_put(carry_host, dev)
        nk = carry_host.shape[rec_axis]

        @jax.jit
        def chain_decode(r, fn=fn, rec_axis=rec_axis):
            def body(c, _):
                o = fn(c)
                # EVERY record's EVERY decoded column feeds the next
                # input: anything less lets XLA dead-code-eliminate the
                # unused outputs (a scalar tag "measured" 992 GB/s on a
                # 2-core CPU), and the full-width fold also keeps each
                # step's content fresh
                tag_vec = jnp.zeros((c.shape[rec_axis],), jnp.uint8)
                for leaf in jtu.tree_leaves(o):
                    # cheapest full-coverage fold: native u8 xor-reduce
                    # over trailing axes (an earlier u32-upcast+sum fold
                    # dominated the chain and under-reported every kernel
                    # ~100x — the fold must stay negligible vs the decode)
                    l8 = leaf.astype(jnp.uint8) & 1
                    if l8.ndim > 1:
                        l8 = lax.reduce(
                            l8,
                            np.uint8(0),
                            lax.bitwise_xor,
                            tuple(range(1, l8.ndim)),
                        )
                    tag_vec = tag_vec ^ l8
                nxt = (
                    c ^ tag_vec[:, None] if rec_axis == 0 else c ^ tag_vec[None, :]
                )
                return nxt, ()

            out, _ = lax.scan(body, r, None, length=CHAIN)
            return out

        buf = chain_decode(carry_dev)  # compile
        int(np.asarray(buf[0, 2]))  # materialize (d2h gate)
        ts = []
        for _ in range(max(3, N_ITERS // 3)):
            if ts and stage_time_left() < 0:
                break  # stage cap: keep what is measured
            t0 = time.time()
            buf = chain_decode(buf)  # content differs every chain
            _ = int(np.asarray(buf[0, 2]))  # forced materialization
            ts.append((time.time() - t0) / CHAIN)
        # one representative output for the byte accounting below
        out = jax.jit(fn)(carry_dev)
        jax.block_until_ready(out)
        st = stats(ts)
        vps = nk / st["median_s"]
        # HBM traffic: read the input buffers; write the decoded columns.
        # Byte count from dtype/shape only — np.asarray here would be a
        # d2h transfer, which wedges when the relay's d2h path is sick.
        leaves = jax.tree_util.tree_leaves(out)
        out_bytes = sum(v.dtype.itemsize * int(np.prod(v.shape)) for v in leaves)
        bytes_total = in_bytes + out_bytes
        gbps = bytes_total / st["median_s"] / 1e9
        frac = gbps * 1e9 / V5E_HBM_BYTES_PER_S
        log(
            f"device-resident decode [{name}]: {fmt_stats(st)} = "
            f"{vps:,.0f} variants/s, {gbps:.1f} GB/s moved "
            f"({in_bytes / 1e6:.0f} MB in + {out_bytes / 1e6:.0f} MB out) "
            f"= {frac * 100:.1f}% of v5e HBM peak "
            f"({V5E_HBM_BYTES_PER_S / 1e9:.0f} GB/s)"
        )
        result[name] = {
            "variants_per_sec": round(vps),
            "gb_per_sec": round(gbps, 2),
            "hbm_peak_fraction": round(frac, 4),
            **st,
        }
        if cal_gbps > 0:
            # judge each kernel against what the rig demonstrably sustains
            result[name]["of_calibrated"] = round(gbps / cal_gbps, 4)
            # the rig's fixed dispatch+fetch cost (measured by the
            # calibration's slope fit) amortizes over CHAIN steps; report
            # the kernel's dispatch-free bandwidth alongside the
            # dispatch-inclusive primary
            fc = result["hbm_calibration"].get("fixed_cost_s", 0.0)
            adj_s = max(st["median_s"] - fc / CHAIN, 1e-9)
            result[name]["gb_per_sec_dispatch_free"] = round(
                bytes_total / adj_s / 1e9, 2
            )
        if frac > 1.0:
            result[name]["note"] = (
                f"implied {gbps:.0f} GB/s exceeds the v5e HBM roofline — "
                "the relay elided execution; treat as an upper bound"
            )
        measured_one = True

    # headline numbers: the kernel the converter actually uses on TPU
    # (the packed XLA decode — vcf_to_h5._decode12)
    best = result.get("packed", result.get("pallas", result["xla"]))
    result.update(best)
    # the docs renderer only trusts numbers from this anti-eliding design
    result["method"] = "chained-scan+d2h-fetch"
    return result


# ---------------------------------------------------------------------
# stage: FASTA encoder (BASELINE config 2)
# ---------------------------------------------------------------------

FASTA_BASES = int(os.environ.get("HH_BENCH_FASTA_BASES", 30_000_000))


def bench_fasta(threads: int) -> dict:
    """Chromosome-scale FASTA -> one-hot HDF5 (the fasta_encoder CLI path,
    reference ``src/haplohyped/fasta_encoder.py:80-109``).  Reports bases/s
    end-to-end including the Blosc HDF5 write + merge."""
    import shutil
    import tempfile

    from haplohyped_tpu.core.config import FastaEncodeConfig
    from haplohyped_tpu.pipeline.fasta_encoder import encode_fasta

    os.makedirs(BENCH_DIR, exist_ok=True)
    # 4 chromosomes: the encoder parallelizes per chromosome (the
    # reference's thread-pool shape, fasta_encoder.py:98-109) — a
    # single-contig corpus would serialize the Blosc/LZ4HC write leg
    n_chroms = 4
    per = FASTA_BASES // n_chroms
    fasta = os.path.join(BENCH_DIR, f"bench_{FASTA_BASES}x{n_chroms}.fasta")
    if not os.path.exists(fasta):
        log(f"generating bench FASTA: {FASTA_BASES} bases / {n_chroms} chroms ...")
        rng = np.random.default_rng(3)
        with open(fasta, "wb") as f:
            for c in range(1, n_chroms + 1):
                seq = np.frombuffer(b"ACGTN", np.uint8)[
                    rng.choice(5, size=per, p=[0.245, 0.245, 0.245, 0.245, 0.02])
                ]
                f.write(f">chr{c}\n".encode())
                for lo in range(0, per, 80):
                    f.write(seq[lo : lo + 80].tobytes() + b"\n")
    out_dir = tempfile.mkdtemp(prefix="hh_fasta_")
    try:
        t0 = time.time()
        encode_fasta(
            FastaEncodeConfig(
                fasta_path=fasta, out_dir=out_dir, cores=threads,
                chromosomes=tuple(f"chr{c}" for c in range(1, n_chroms + 1)),
            )
        )
        secs = time.time() - t0
        bps = FASTA_BASES / secs
        log(
            f"fasta_encoder: {FASTA_BASES / 1e6:.0f}M bases -> one-hot HDF5 "
            f"in {secs:.1f}s = {bps / 1e6:.1f}M bases/s"
        )
        return {"bases": FASTA_BASES, "seconds": round(secs, 2), "bases_per_sec": round(bps)}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# ---------------------------------------------------------------------
# stage: whole-genome config (3M variants end-to-end incl. HDF5 write)
# ---------------------------------------------------------------------


def bench_whole_genome(threads: int, device_decode: bool) -> dict:
    """Full vcf_to_h5 run on a 3M-variant VCF: parse + device decode +
    Blosc HDF5 write + merge.  Reference: ~6s parse + ~12s write for 3M
    variants on Xeon+NVMe (reference README.md:123)."""
    import shutil
    import tempfile

    from haplohyped_tpu.pipeline.vcf_to_h5 import VCFtoHDF5Converter

    wg_dir = ensure_wg_corpus()
    out_dir = tempfile.mkdtemp(prefix="hh_wg_")
    try:
        # median-of-3 like every other stage (was the only single-shot
        # number in the bench; the rig swings runs of identical work
        # 1.6s..3.0s with its mood)
        runs = []
        n_snps, ok = 0, True
        for i in range(3):
            conv = VCFtoHDF5Converter(
                cohort_name=f"wg{i}",
                vcf_dir=wg_dir,
                out_dir=out_dir,
                sample_list_path=os.path.join(wg_dir, "samples.txt"),
                cores=2,
                cxx_threads=threads,
                chromosomes=[1],
                device_decode=device_decode,
            )
            t0 = time.time()
            results = conv.run()
            runs.append(time.time() - t0)
            n_snps = sum(r.n_snps for r in results)
            ok = ok and not any(r.error for r in results)
        secs = sorted(runs)[len(runs) // 2]
        vps = n_snps / secs if secs > 0 else 0
        log(
            f"whole-genome: {n_snps} variants -> cohort HDF5 in {secs:.1f}s "
            f"median-of-{len(runs)} (best {min(runs):.1f}s; "
            f"{vps:,.0f} variants/s incl. Blosc write+merge; "
            f"reference ~18s parse+write; ok={ok})"
        )
        return {
            "n_variants": n_snps,
            "seconds": round(secs, 2),
            "best_seconds": round(min(runs), 2),
            "runs_s": [round(r, 2) for r in runs],
            "variants_per_sec": round(vps),
            "ref_seconds": 18.0,
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# ---------------------------------------------------------------------
# stage: sampler windows/sec
# ---------------------------------------------------------------------


def _window_fixture():
    """Synthetic sampler fixture shared by the windows + window_kernels
    stages: 10M-base genome, 8 donors x 100K variants, 256 BED regions."""
    from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE
    from haplohyped_tpu.data.cohort import CohortTensors
    from haplohyped_tpu.data.genome import GenomeTensors

    rng = np.random.default_rng(1)
    L_chrom = 10_000_000
    genome = GenomeTensors.from_code_arrays(
        {"chr1": rng.integers(0, 4, size=L_chrom).astype(np.int8)}
    )
    n_var = 100_000
    pos = np.sort(rng.choice(L_chrom - 100, size=n_var, replace=False)).astype(np.int64)
    table = np.zeros(n_var, dtype=SNP_STRUCT_DTYPE)
    table["chrom"] = b"chr1"
    table["start"] = pos
    table["stop"] = pos + 1
    table["ref"] = b"A"
    table["alt"] = b"G"
    table["phase1"] = rng.integers(0, 2, size=n_var)
    table["phase2"] = rng.integers(0, 2, size=n_var)
    donors = [f"d{i}" for i in range(8)]
    cohort = CohortTensors.from_structs(
        {(d, "chr1"): table for d in donors}, donors, ["chr1"]
    )
    spans = np.stack(
        [(s := rng.integers(0, L_chrom - 2000, size=256)), s + 1500], axis=1
    )
    return genome, cohort, spans


#: Per-process nonce folded into every sampler-bench PRNG key: the relay
#: caches executions by (executable, input) hash ACROSS processes, so keys
#: that repeat between bench runs (the old fixed 1000+i scheme) can come
#: back as sub-RPC-latency cache hits and inflate windows/s by 100x+.
_KEY_NONCE = (os.getpid() * 1_000_003 + int(time.time() * 1000)) % (1 << 30)


def _time_sampler(
    sampler, n_batches: int, iters: int, key_offset: int = 0,
    materialize: bool = False,
) -> list[float]:
    """Per-iteration wall times of ``sample_many`` with FRESH host-built
    PRNG keys (a caching execution relay elides repeats on identical
    inputs — measured 148x physical peak when violated; the nonce keeps
    keys fresh across RUNS, not just iterations).

    ``materialize=True`` ends each timed iteration with a 1-element d2h
    fetch: the relay also acks ``block_until_ready`` before executing in
    some moods, and serving any real output byte requires the whole
    executable to have run.  Costs ~RPC latency per iteration, so callers
    use fused batches big enough to amortize it; without it (wedged d2h)
    the numbers are upper bounds."""
    import jax

    ts = []
    for i in range(iters):
        if ts and stage_time_left() < 0:
            break  # stage cap hit: keep what is measured (r4 #1)
        key = jax.random.PRNGKey(_KEY_NONCE + key_offset + i)
        t0 = time.time()
        o = sampler.sample_many(n_batches, key=key)
        if materialize:
            _ = int(np.asarray(o.n_variants).ravel()[0])
        else:
            jax.block_until_ready(o.hap1)
        ts.append(time.time() - t0)
        del o  # one result in flight, not two (one-hot results are ~GB)
    return ts


def bench_windows(materialize: bool = False) -> dict:
    """Haplotype windows/sec from the on-device sampler (the shipped
    default kernel), codes + one-hot modes, median-of-N_ITERS.

    ``materialize=True`` (healthy d2h): each timed iteration ends with a
    1-element fetch the relay cannot fake, and the fused batch count is
    raised so the RPC latency amortizes — reported numbers are honest
    lower bounds.  Without it they are upper bounds."""
    import jax

    from haplohyped_tpu.core.config import SamplerConfig
    from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

    genome, cohort, spans = _window_fixture()
    B, L = 64, 1000
    cfg = SamplerConfig(seq_length=L, batch_size=B, seed=0, max_variants_per_window=64)
    if jax.devices()[0].platform == "cpu":
        n_batches, iters = 8, 3
    else:
        # materialized mode ends every iteration with a d2h fetch (~RPC
        # latency); 2048 fused batches (131K windows/dispatch) amortize it
        # to <1% at healthy-link speeds and 4x the slow-mood floor
        n_batches, iters = (2048 if materialize else 64), N_ITERS

    out = {}
    for mode, emit_onehot in (("codes", False), ("onehot", True)):
        # one-hot output is 5x the bytes: cap its fused batch count so the
        # in-flight results (current + previous iteration) stay well clear
        # of HBM — a 2048-batch one-hot run OOMed the relay backend AND
        # poisoned every later allocation in the process
        nb = min(n_batches, 512) if emit_onehot else n_batches
        try:
            sampler = DeviceHaplotypeSampler(
                genome, cohort, spans, cfg, emit_onehot=emit_onehot
            )
            b = sampler.sample_many(nb)  # compile
            jax.block_until_ready(b.hap1)
            del b
            # budget guard (same as window_kernels): in the relay's slow-
            # dispatch mood one fused call can cost seconds; probe one
            # iteration and shrink the count so this stage can't starve
            # the stages after it
            probe = _time_sampler(
                sampler, nb, 1, key_offset=20_000, materialize=materialize
            )[0]
            # flag the relay's slow-per-dispatch mood for later stages
            # (>=10x the healthy fused-call cost at this batch count)
            if not emit_onehot:
                _HINTS["slow_dispatch"] = probe > max(1.0, nb / 2048)
            # two modes share this stage's deadline budget (r4 #1)
            budget = min(30.0, max(6.0, stage_time_left() * 0.45))
            it = iters if probe * iters <= budget else max(3, int(budget / max(probe, 1e-9)))
            if it < iters:
                log(f"sampler [{mode}]: slow dispatch ({probe:.1f}s/iter); {it} iters")
            ts = _time_sampler(sampler, nb, it, materialize=materialize)
            st = stats(ts)
        except Exception as exc:  # a failed mode must not lose the other
            log(f"sampler [{mode}] failed: {exc}")
            out[mode] = 0
            out[f"{mode}_error"] = str(exc)[:200]
            continue
        wps = B * nb / st["median_s"]
        out[mode] = wps
        out[f"{mode}_stats"] = st
        out["materialized"] = materialize
        flag = _roofline_flag(wps, L, onehot=emit_onehot)
        if flag:
            out[f"{mode}_note"] = flag
        log(
            f"sampler [{mode}] (kernel={cfg.window_kernel}, fused x{nb}, "
            f"fresh keys): {fmt_stats(st)} = {wps:,.0f} windows/s at median"
            + (f"  [{flag}]" if flag else "")
        )
    return out


def _roofline_flag(wps: float, L: int, onehot: bool = False) -> str | None:
    """Flag windows/s claims that exceed the chip's physical memory
    roofline — a relay that acks before executing (observed on this rig)
    can return sub-ms timings for work whose output alone would need more
    than HBM peak bandwidth.  Honest reporting: annotate, don't deadpan."""
    # per window: >= L bytes of genome reads and L (codes) or 5L (one-hot)
    # bytes of output writes — a hard lower bound on HBM traffic
    bytes_per_window = L + (5 * L if onehot else L)
    implied = wps * bytes_per_window
    if implied > 0.9 * V5E_HBM_BYTES_PER_S:
        return (
            f"implied {implied / 1e9:.0f} GB/s exceeds the v5e HBM roofline "
            f"({V5E_HBM_BYTES_PER_S / 1e9:.0f} GB/s) — the relay is eliding "
            "execution; treat as an upper bound, not a measurement"
        )
    return None


def bench_window_kernels(materialize: bool = False) -> dict:
    """3-way shoot-out of the bit-equal window kernels (baseline jnp /
    fast word-gather / Pallas DMA) on the chip — the sampler default is
    whichever wins here (VERDICT r2 #2).  Median-of-N_ITERS decides."""
    import jax

    from haplohyped_tpu.core.config import SamplerConfig
    from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

    genome, cohort, spans = _window_fixture()
    B, L = 64, 1000
    on_cpu = jax.devices()[0].platform == "cpu"
    # 2048 fused batches (131K windows/dispatch): at 256 the measured
    # winner still flip-flopped run to run because ~0.2ms dispatches sit
    # on the relay's 0.1-0.3ms dispatch floor; ~1.5-2ms dispatches put
    # kernel time in charge of the median
    n_batches, iters = (
        (4, 3) if on_cpu else (int(os.environ.get("HH_BENCH_WINDOW_NB", 2048)), N_ITERS)
    )
    if not on_cpu and _HINTS.get("slow_dispatch"):
        # the windows stage just measured the relay in its slow-per-
        # dispatch mood: a 2048-batch fused call costs seconds there, so
        # the full paired design would blow the stage cap before round 2.
        # 256 batches keep rounds ~8x cheaper at the cost of a bit more
        # dispatch overhead in the medians (the chained stage carries the
        # kernel-truth number either way).
        n_batches = min(n_batches, 256)
        log("window kernels: slow-dispatch hint from windows stage; nb=256")

    out = {}
    kernels = ["baseline", "fast"] if on_cpu else ["baseline", "fast", "pallas"]
    samplers = {}
    for kernel in kernels:
        cfg = SamplerConfig(
            seq_length=L, batch_size=B, seed=0,
            max_variants_per_window=64, window_kernel=kernel,
        )
        try:
            samplers[kernel] = DeviceHaplotypeSampler(genome, cohort, spans, cfg)
            t0 = time.time()
            b = samplers[kernel].sample_many(n_batches)  # compile
            jax.block_until_ready(b.hap1)
            log(f"window kernel [{kernel}]: compile+first {time.time() - t0:.1f}s")
        except Exception as exc:
            log(f"window kernel [{kernel}] failed: {exc}")
            out[kernel] = {"windows_per_sec": 0, "error": str(exc)[:200]}
    # PAIRED design: each round times every kernel back-to-back, so all
    # kernels see the same rig/relay mood and the per-round ranking cancels
    # the drift that made sequential per-kernel blocks flip winners between
    # otherwise-identical runs.  Winner = most round-wins (sign test), with
    # per-kernel medians reported for throughput.
    # budget guard: the relay has a per-step-dispatch mode where one fused
    # call costs seconds instead of milliseconds (measured 35,000x spread
    # on identical code); probe one round and shrink the round count so a
    # slow-mode stage can't starve the stages that follow it
    probe = []
    for s in samplers.values():
        if probe and stage_time_left() < 0:
            break  # slow-dispatch probe must not blow the stage cap
        probe.append(
            _time_sampler(s, n_batches, 1, key_offset=10_000,
                          materialize=materialize)[0]
        )
    round_cost = sum(probe) * len(samplers) / max(len(probe), 1)
    budget = min(60.0, max(10.0, stage_time_left() * 0.9))
    if round_cost * iters > budget:
        iters = max(2, int(budget / max(round_cost, 1e-9)))
        log(
            f"window kernels: slow dispatch mode ({round_cost:.1f}s/round); "
            f"reducing to {iters} rounds"
        )
    times: dict[str, list[float]] = {k: [] for k in samplers}
    rounds_done = 0
    for r in range(iters):
        if rounds_done and stage_time_left() < 0:
            break  # cap enforced between paired rounds
        for kernel, sampler in samplers.items():
            times[kernel].extend(
                _time_sampler(sampler, n_batches, 1, key_offset=r,
                              materialize=materialize)
            )
        rounds_done += 1
    iters = rounds_done or iters
    wins = {k: 0 for k in samplers}
    for r in range(iters):
        best = min(samplers, key=lambda k: times[k][r])
        wins[best] += 1
    for kernel in samplers:
        st = stats(times[kernel])
        wps = B * n_batches / st["median_s"]
        out[kernel] = {
            "windows_per_sec": round(wps),
            "round_wins": wins[kernel],
            **st,
        }
        if materialize:
            # roofline accounting (VERDICT r3 #7): >= L genome-read bytes
            # + L codes-write bytes per window is a hard lower bound on
            # HBM traffic; only attached to VERIFIED (materialized) runs
            gbps = wps * 2 * L / 1e9
            out[kernel]["gb_per_sec"] = round(gbps, 2)
            out[kernel]["hbm_peak_fraction"] = round(
                gbps * 1e9 / V5E_HBM_BYTES_PER_S, 4
            )
        flag = _roofline_flag(wps, L)
        if flag:
            out[kernel]["note"] = flag
        log(
            f"window kernel [{kernel}]: {fmt_stats(st)} "
            f"= {wps:,.0f} windows/s at median, {wins[kernel]}/{iters} round wins"
            + (f"  [{flag}]" if flag else "")
        )
    winner = max(
        samplers,
        key=lambda k: (wins[k], -stats(times[k])["median_s"]),
    ) if samplers else "none"
    out["winner"] = winner
    out["materialized"] = materialize
    log(f"window kernel winner (paired round wins): {winner}")
    return out


def bench_windows_chain() -> dict:
    """Device-resident windows/sec via the sampler's chained measurement
    kernel (``DeviceHaplotypeSampler.sample_chain``): n_chain dependent
    fused dispatches in ONE executable ending in a scalar digest fetch —
    the same anti-eliding design as the decode roofline, so dispatch and
    fetch costs amortize over the whole chain instead of bounding every
    iteration (the plain ``windows`` stage is dispatch-inclusive and
    underreports the kernel ~100x through a slow relay)."""
    import jax

    from haplohyped_tpu.core.config import SamplerConfig
    from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

    genome, cohort, spans = _window_fixture()
    B, L = 64, 1000
    on_cpu = jax.devices()[0].platform == "cpu"
    n_chain, n_batches = (2, 4) if on_cpu else (16, 256)
    # production kernel FIRST: a stage-cap hit costs the losers' numbers,
    # never the winner's (r4 #1)
    kernels = ["fast"] if on_cpu else ["pallas", "fast", "baseline"]
    out: dict = {"n_chain": n_chain, "n_batches": n_batches,
                 "method": "chained-scan+d2h-fetch"}
    for kernel in kernels:
        if kernel != kernels[0] and stage_time_left() < 5:
            out[kernel] = {"windows_per_sec": 0, "error": "stage cap hit"}
            continue
        cfg = SamplerConfig(
            seq_length=L, batch_size=B, seed=0,
            max_variants_per_window=64, window_kernel=kernel,
        )
        try:
            s = DeviceHaplotypeSampler(genome, cohort, spans, cfg)
            key = jax.random.PRNGKey(_KEY_NONCE + 31_337)
            t0 = time.time()
            d = s.sample_chain(n_chain, n_batches, key=key)
            int(np.asarray(d))  # compile + digest fetch
            log(f"windows chain [{kernel}]: compile+first {time.time() - t0:.1f}s")
            ts = []
            for i in range(max(3, N_ITERS // 3)):
                if ts and stage_time_left() < 0:
                    break  # stage cap: keep what is measured
                k = jax.random.PRNGKey(_KEY_NONCE + 31_338 + i)
                t0 = time.time()
                d = s.sample_chain(n_chain, n_batches, key=k)
                _ = int(np.asarray(d))  # the fetch IS the attestation
                ts.append(time.time() - t0)
            st = stats(ts)
            wps = n_chain * n_batches * B / st["median_s"]
            gbps = wps * 2 * L / 1e9
            out[kernel] = {
                "windows_per_sec": round(wps),
                "gb_per_sec": round(gbps, 2),
                "hbm_peak_fraction": round(gbps * 1e9 / V5E_HBM_BYTES_PER_S, 4),
                **st,
            }
            log(
                f"windows chain [{kernel}]: {fmt_stats(st)} = "
                f"{wps:,.0f} windows/s device-resident "
                f"({gbps:.1f} GB/s lower-bound traffic)"
            )
        except Exception as exc:
            log(f"windows chain [{kernel}] failed: {exc}")
            out[kernel] = {"windows_per_sec": 0, "error": str(exc)[:200]}
    real = {k: v for k, v in out.items()
            if isinstance(v, dict) and v.get("windows_per_sec", 0) > 0}
    out["winner"] = max(real, key=lambda k: real[k]["windows_per_sec"]) if real else "none"
    return out


def _train_flops_per_step(fused, state, n_params: int, B: int, T: int) -> tuple[float, str]:
    """Model FLOPs per fused train step (VERDICT r4 #5).  Primary source:
    XLA's own cost model on the compiled executable; fallback: the 6ND
    transformer rule of thumb (fwd+bwd ~ 6 x params x tokens)."""
    import jax
    import jax.numpy as jnp

    try:
        # Lowered.cost_analysis() is free host-side HLO analysis, but the
        # TPU backend returns None there; fall through to the compiled
        # executable's analysis ONLY when the stage budget allows — the
        # call is a persistent-cache hit (<1s) when the fused step was
        # already executed this run, but a COLD compile goes through the
        # relay's remote AOT helper and blew the train cap in the r5
        # dress rehearsal, hence the time guard.
        lowered = fused.lower(state, jnp.int32(0))
        ca = lowered.cost_analysis()
        if ca is None and stage_time_left() > 10:
            # the fused step just executed, so this compile is a
            # persistent-cache hit (measured <1s warm)
            ca = lowered.compile().cost_analysis()
        elif ca is None:
            log("cost_analysis skipped (stage cap imminent); analytic 6ND")
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float((ca or {}).get("flops", 0.0))
        if flops > 0:
            return flops, "xla-cost-analysis"
    except Exception as exc:
        log(f"cost_analysis unavailable ({exc}); using analytic 6ND")
    return 6.0 * n_params * B * T, "analytic-6ND"


def _bench_train_config(
    genome, cohort, spans, *, B: int, L: int, mcfg, K: int, iters: int
) -> dict:
    """One fused sample+train measurement at a given (model, batch) point.
    K per-step dispatches queue asynchronously; params chain step k -> k+1
    on device, so the FINAL loss fetch forces the whole sequence."""
    import jax
    import jax.numpy as jnp

    from haplohyped_tpu.core.config import SamplerConfig
    from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler
    from haplohyped_tpu.models.haploformer import HaploFormer
    from haplohyped_tpu.models.train import create_train_state, make_fused_train_step

    on_cpu = jax.devices()[0].platform == "cpu"
    cfg = SamplerConfig(seq_length=L, batch_size=B, seed=0, max_variants_per_window=64)
    sampler = DeviceHaplotypeSampler(genome, cohort, spans, cfg)
    model = HaploFormer(mcfg)
    first = sampler.sample()
    state, tx = create_train_state(
        model, jax.random.PRNGKey(_KEY_NONCE % 997), (first.hap1, first.hap2), 3e-4
    )
    fused = make_fused_train_step(model, tx, sampler)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
    )

    def train_k(st, base_idx: int):
        m = None
        for i in range(K):
            st, m = fused(st, jnp.int32(base_idx + i))
        return st, m["loss"]

    t0 = time.time()
    state, loss = train_k(state, 0)
    loss0 = float(np.asarray(loss))  # compile + attestation fetch
    log(f"fused train: compile+first chain {time.time() - t0:.1f}s (loss {loss0:.3f})")
    ts = []
    lv = loss0
    for i in range(iters):
        if ts and stage_time_left() < 0:
            break  # stage cap: keep what is measured
        t0 = time.time()
        state, loss = train_k(state, (i + 1) * K)
        lv = float(np.asarray(loss))  # forced materialization
        ts.append((time.time() - t0) / K)
    st = stats(ts)
    sps = 1.0 / st["median_s"]
    # FLOPs accounting AFTER the measurement: the fused step is compiled
    # and in the persistent cache now, so the compiled-executable
    # cost_analysis path is a cache hit instead of a cold remote compile
    flops_step, flops_src = _train_flops_per_step(
        fused, state, n_params, B, L // mcfg.pool
    )
    mfu = None if on_cpu else flops_step * sps / V5E_BF16_FLOPS_PER_S
    out = {
        "steps_per_sec": round(sps, 2),
        "windows_per_sec": round(sps * B),
        "tokens_per_sec": round(sps * B * L),
        "n_params": n_params,
        "flops_per_step": round(flops_step),
        "flops_source": flops_src,
        "batch": B,
        "seq_len": L,
        "model": {
            "d_model": mcfg.d_model, "layers": mcfg.num_layers,
            "dtype": mcfg.dtype,
        },
        "final_loss": round(lv, 4),
        "method": "chained-scan+loss-fetch",
        **st,
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    log(
        f"fused sample+train ({mcfg.num_layers}L d{mcfg.d_model} {mcfg.dtype}, "
        f"B{B}): {fmt_stats(st)}/step = {sps:.1f} steps/s, "
        f"{sps * B * L / 1e6:.2f}M tokens/s"
        + (f", MFU {mfu * 100:.1f}% ({flops_src})" if mfu is not None else "")
        + f" (loss {lv:.3f})"
    )
    return out


def bench_train() -> dict:
    """Fully on-device training throughput: the fused sample-into-train
    step (sampler draw + HaploFormer fwd/bwd + optax update in ONE
    dispatch — `models/train.make_fused_train_step`).  Reports steps/s,
    tokens/s, and MFU (VERDICT r4 #5) at two points: the flagship default
    config, and — when the stage budget allows — a scaled config (d512 x
    8L, B256) that shows whether the chip CAN be fed, i.e. whether a low
    default-config MFU is a framework bound or just a small model."""
    import jax

    from haplohyped_tpu.models.haploformer import HaploFormerConfig

    genome, cohort, spans = _window_fixture()
    on_cpu = jax.devices()[0].platform == "cpu"
    out = _bench_train_config(
        genome, cohort, spans,
        B=64, L=1000,
        mcfg=HaploFormerConfig(num_layers=2 if on_cpu else 4),
        K=4 if on_cpu else 20,
        iters=max(3, N_ITERS // 3),
    )
    if not on_cpu and out.get("mfu") is not None:
        if out["mfu"] < 0.2 and stage_time_left() > 90:
            # the default model is too small to judge the framework by:
            # measure a config sized for the MXU (one extra compile)
            try:
                scaled = _bench_train_config(
                    genome, cohort, spans,
                    B=256, L=1000,
                    mcfg=HaploFormerConfig(d_model=512, num_layers=8),
                    K=8, iters=3,
                )
                out["scaled"] = scaled
            except Exception as exc:
                log(f"scaled train config failed: {exc}")
        mfu = out.get("scaled", out)["mfu"]
        out["bound"] = (
            "MXU-fed at the measured config" if mfu >= 0.2 else
            "small-model bound: per-step dispatch + sampler overhead "
            "dominate at this size; see 'scaled' for the fed-chip point"
        )
    return out


def bench_window_parity() -> dict:
    """On-chip bit-equality attestation for the window kernels (VERDICT r3
    #4): the Pallas kernel's parity was previously pinned only in interpret
    mode on CPU — here the COMPILED kernels all sample with the same PRNG
    key on the chip, their outputs are fetched, and a joint content hash is
    recorded.  Requires healthy d2h (the fetch IS the attestation)."""
    import hashlib

    import jax

    from haplohyped_tpu.core.config import SamplerConfig
    from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

    genome, cohort, spans = _window_fixture()
    B, L = 64, 1000
    on_cpu = jax.devices()[0].platform == "cpu"
    kernels = ["baseline", "fast"] if on_cpu else ["baseline", "fast", "pallas"]
    key = jax.random.PRNGKey(_KEY_NONCE + 777)
    outs = {}
    for kernel in kernels:
        cfg = SamplerConfig(
            seq_length=L, batch_size=B, seed=0,
            max_variants_per_window=64, window_kernel=kernel,
        )
        s = DeviceHaplotypeSampler(genome, cohort, spans, cfg)
        b = s.sample_many(4, key=key)
        outs[kernel] = {
            f: np.asarray(jax.device_get(getattr(b, f)))
            for f in ("hap1_codes", "hap2_codes", "n_variants")
        }
    ref_name = kernels[0]
    ref = outs[ref_name]
    mismatch = [
        k for k in kernels[1:]
        if not all(np.array_equal(ref[f], outs[k][f]) for f in ref)
    ]
    h = hashlib.sha256()
    for f in sorted(ref):
        h.update(ref[f].tobytes())
    digest = h.hexdigest()[:16]
    parity = not mismatch
    log(
        f"window kernel parity ({'+'.join(kernels)}, compiled, materialized): "
        f"{'BIT-EQUAL' if parity else f'MISMATCH in {mismatch}'} "
        f"sha256[:16]={digest}"
    )
    return {
        "parity": parity,
        "kernels": kernels,
        "sha256_16": digest,
        "platform": jax.devices()[0].platform,
        "mismatch": mismatch,
    }


# ---------------------------------------------------------------------
# stage: tokenizer vs frame12 (the two L1 paths, head-to-head)
# ---------------------------------------------------------------------

TOK_VARIANTS = int(os.environ.get("HH_BENCH_TOK_VARIANTS", 500_000))


def _ensure_tok_corpora(n_files: int) -> list[str]:
    """Distinct PER-RUN corpora for the tokenizer head-to-head: the relay
    caches executions by content hash ACROSS processes, so every timed
    iteration must read a file no run has ever uploaded before — the
    seed folds in a per-run nonce, and one file exists per (warm + timed)
    iteration so no content repeats within the run either."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="hh_tok_", dir=BENCH_DIR if os.path.isdir(BENCH_DIR) else None)
    import atexit

    atexit.register(shutil.rmtree, d, ignore_errors=True)
    paths = []
    for k in range(n_files):
        p = os.path.join(d, f"tok_{TOK_VARIANTS}_{k}.bgzf.vcf.gz")
        log(f"generating tokenizer corpus {k}/{n_files}: {TOK_VARIANTS} variants ...")
        _make_vcf(
            p, TOK_VARIANTS, ["tok-sample-0000"],
            seed=(_KEY_NONCE % 100_000) * 64 + k,
        )
        paths.append(p)
    return paths


def bench_tokenizer(threads: int) -> dict:
    """Head-to-head of the two L1 ingest paths (VERDICT r3 #8): the
    all-device tokenizer (raw BGZF text -> device tokenize+decode) vs the
    production frame12 path (native host framing -> 12 B/record upload ->
    jit decode).  Both end with their decode columns ON THE HOST (the
    converter's contract: struct assembly is host-side), so the comparison
    includes each path's own d2h bill.  Median over distinct-file
    iterations; the winner justifies ``use_tokenizer``'s default."""
    import jax

    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.ops.vcf_decode import decode_frames12
    from haplohyped_tpu.ops.vcf_stream import tokenize_vcf_streaming

    iters = max(3, N_ITERS // 2)
    if stage_time_left() < 60:
        iters = 3  # corpus generation + warm runs must fit the stage cap
    # one corpus per (warm + timed) iteration: index i maps to file i
    paths = _ensure_tok_corpora(iters + 1)
    sample = "tok-sample-0000"
    dev = jax.devices()[0]

    def run_tokenizer(i: int) -> int:
        out = tokenize_vcf_streaming(
            paths[i % len(paths)], sample, threads=threads
        )
        return int(out["start"].shape[0])

    def run_frame12(i: int) -> int:
        rec, chroms, _ = native.vcf_frame12(
            paths[i % len(paths)], sample, None, threads=threads
        )
        dec = decode_frames12(jax.device_put(rec, dev))
        cols = {k: np.asarray(v) for k, v in jax.device_get(dict(dec)).items()}
        return int(cols["start"].shape[0])

    results = {}
    for name, fn in (("tokenizer", run_tokenizer), ("frame12", run_frame12)):
        try:
            t0 = time.time()
            n = fn(0)  # compile + warm
            log(f"L1 {name}: compile+first {time.time() - t0:.1f}s ({n} records)")
            ts = []
            for i in range(iters):
                if ts and stage_time_left() < 0:
                    break  # stage cap: keep what is measured
                t0 = time.time()
                fn(i + 1)
                ts.append(time.time() - t0)
            st = stats(ts)
            results[name] = {"vps": round(n / st["median_s"]), **st}
            log(
                f"L1 {name}: {fmt_stats(st)} = "
                f"{results[name]['vps']:,.0f} variants/s end-to-end (incl. d2h)"
            )
        except Exception as exc:
            log(f"L1 {name} failed: {exc}")
            results[name] = {"vps": 0, "error": str(exc)[:200]}
    winner = max(("tokenizer", "frame12"), key=lambda k: results[k]["vps"])
    results["winner"] = winner
    log(f"L1 ingest winner at median: {winner}")
    return results


# ---------------------------------------------------------------------
# stage: storage
# ---------------------------------------------------------------------


def bench_storage(n_records: int = 1_000_000) -> dict:
    """HDF5+Blosc write/read/random-access throughput + compression ratio
    (the reference's other headline numbers: 256K wr/s, 342K rd/s, 6.5x,
    1597 slices/s on Xeon+NVMe)."""
    import tempfile

    import h5py

    from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE
    from haplohyped_tpu.storage import blosc_available, cohort_compression_kwargs

    rng = np.random.default_rng(0)
    data = np.zeros(n_records, dtype=SNP_STRUCT_DTYPE)
    data["chrom"] = b"chr1"
    data["start"] = np.sort(rng.integers(0, 250_000_000, n_records)).astype(np.uint32)
    data["stop"] = data["start"] + 1
    bases = np.frombuffer(b"ACGT", np.uint8)
    data["ref"] = bases[rng.integers(0, 4, n_records)].view("S1").astype("S10")
    data["alt"] = bases[rng.integers(0, 4, n_records)].view("S1").astype("S10")
    data["phase1"] = rng.integers(0, 2, n_records)
    data["phase2"] = rng.integers(0, 2, n_records)

    from haplohyped_tpu.storage.fastwrite import write_dataset_direct

    path = tempfile.mktemp(suffix=".h5")
    try:
        t0 = time.time()
        with h5py.File(path, "w") as f:
            # the engine's production writer: parallel chunk compression
            # outside the HDF5 lock + direct chunk IO
            write_dataset_direct(
                f,
                "snp_data",
                data,
                cohort_compression_kwargs(n_records),
                workers=os.cpu_count() or 2,
            )
        wr = n_records / (time.time() - t0)
        ratio = data.nbytes / os.path.getsize(path)

        t0 = time.time()
        with h5py.File(path, "r") as f:
            back = f["snp_data"][()]
        rd = n_records / (time.time() - t0)
        assert np.array_equal(back, data)

        with h5py.File(path, "r") as f:
            d = f["snp_data"]
            starts = rng.integers(0, n_records - 1000, 2000)
            t0 = time.time()
            for s in starts:
                _ = d[s : s + 500]
            slices = len(starts) / (time.time() - t0)
        log(
            f"storage (blosc={blosc_available()}): write {wr:,.0f} rec/s "
            f"(ref 256K), read {rd:,.0f} rec/s (ref 342K), "
            f"ratio {ratio:.1f}x (ref 6.5x), random {slices:,.0f} slices/s (ref 1597)"
        )
        return {
            "write_rec_per_sec": round(wr),
            "read_rec_per_sec": round(rd),
            "ratio": round(ratio, 2),
            "random_slices_per_sec": round(slices),
        }
    finally:
        if os.path.exists(path):
            os.unlink(path)


# ---------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------

#: partial results for the watchdog (filled as phases complete)
_PARTIAL: dict = {}


def _emit(result: dict) -> None:
    print(json.dumps(result), flush=True)


def _result_json() -> dict:
    out = {
        "metric": "variants/sec/chip (parse+encode)",
        "value": _PARTIAL.get("value", 0),
        "unit": "variants/sec",
        "vs_baseline": round(
            _PARTIAL.get("value", 0) / BASELINE_VARIANTS_PER_SEC, 3
        ),
    }
    for k in (
        "windows_per_sec",
        "windows_per_sec_onehot",
        "windows_materialized",
        "windows_note",
        "window_kernels",
        "windows_chain",
        "window_parity",
        "window_kernel_parity",
        "cohort_donor_variants_per_sec",
        "decode12_xla_vps",
        "decode12_pallas_vps",
        "decode12",
        "device_roofline",
        "train",
        "tokenizer",
        "whole_genome",
        "fasta",
        "storage",
        "parse_encode_stats",
        "note",
    ):
        if k in _PARTIAL:
            out[k] = _PARTIAL[k]
    return out


def _watchdog(budget_s: float) -> None:
    """If the run stalls (wedged transfers), emit the JSON line from the
    measurements completed so far and exit, so the driver always gets real
    numbers rather than nothing."""
    import threading

    def fire():
        if _PARTIAL.get("emitted"):
            return
        if "value" in _PARTIAL:
            log(f"WATCHDOG: emitting partial results after {budget_s:.0f}s stall")
            _emit(_result_json())
        else:
            log("WATCHDOG: no completed measurements; exiting without JSON")
        os._exit(3)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()


def bench_host_only(vcf: str, sample: str, threads: int) -> dict:
    """Last-resort measurement that touches no accelerator: native v2
    framing + the numpy reference decode.  A complete, honest parse+encode
    (same outputs as the device kernel), just on the host CPU."""
    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.ops.vcf_decode import decode_frames_v2_numpy, pad_v2_sides

    best = None
    deadline = time.time() + float(os.environ.get("HH_BENCH_HOSTONLY_S", 120))
    for it in range(3):
        t0 = time.time()
        fr = native.vcf_frame_v2(vcf, sample, None, threads=threads)
        ei, ep, rc, ri = pad_v2_sides(fr)
        dec = decode_frames_v2_numpy(fr.fixed, fr.gt, ei, ep, rc, ri)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if it == 0 and time.time() + dt > deadline:
            break  # bounded: never blow the orchestrator budget re-iterating
    n = fr.n
    vps = n / best
    log(
        f"host-only parse+encode (frame_v2 + numpy decode): {n} variants in "
        f"{best:.3f}s = {vps:,.0f} variants/s ({int(dec['snp_mask'].sum())} SNPs)"
    )
    return {
        "metric": "variants/sec/chip (parse+encode)",
        "value": round(vps),
        "unit": "variants/sec",
        "vs_baseline": round(vps / BASELINE_VARIANTS_PER_SEC, 3),
        "note": "host-only fallback (accelerator unreachable)",
    }


def _extract_json(stdout: bytes) -> dict | None:
    for line in reversed(stdout.decode(errors="replace").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run_worker(env_extra: dict, timeout_s: float) -> dict | None:
    """Run the measurement worker in a subprocess; return its JSON result
    or None on timeout/crash/no-JSON.  The subprocess boundary is the only
    reliable guard against wedged device runtimes hanging this process.

    The worker receives HH_BENCH_BUDGET_S scaled to ITS timeout so its
    in-process watchdog (armed at 0.8x that budget) fires — and emits any
    partial measurements — before this subprocess kill does; if the kill
    wins anyway, the partial stdout captured by TimeoutExpired is scanned
    for a JSON line rather than discarded."""
    import subprocess

    env = dict(os.environ)
    env["HH_BENCH_WORKER"] = "1"
    env["HH_BENCH_BUDGET_S"] = str(timeout_s)
    env.update(env_extra)
    tag = env_extra.get("JAX_PLATFORMS", "default-platform")
    log(f"--- launching bench worker ({tag}, timeout {timeout_s:.0f}s) ---")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired as exc:
        log(f"worker ({tag}) timed out after {timeout_s:.0f}s")
        result = _extract_json(exc.stdout) if exc.stdout else None
        if result is not None:
            log(f"worker ({tag}) left a partial JSON line before the kill; using it")
        return result
    result = _extract_json(proc.stdout)
    if result is None:
        log(f"worker ({tag}) exited rc={proc.returncode} without a JSON line")
    return result


def orchestrate() -> None:
    """Always emits exactly one JSON line: try the real accelerator in a
    killable subprocess, then the CPU platform, then a host-only inline
    measurement (no accelerator involved).  Worker timeouts are computed
    from the REMAINING budget so the whole orchestration stays inside
    HH_BENCH_BUDGET_S even after slow corpus generation."""
    threads = os.cpu_count() or 1
    budget = float(os.environ.get("HH_BENCH_BUDGET_S", 480))
    t_start = time.time()
    vcf, sample = ensure_corpus()

    remaining = budget - (time.time() - t_start)
    result = _run_worker({}, timeout_s=max(60.0, remaining * 0.7))
    if result is None and os.environ.get("JAX_PLATFORMS", "") != "cpu":
        remaining = budget - (time.time() - t_start)
        result = _run_worker(
            {"JAX_PLATFORMS": "cpu", "HH_BENCH_VARIANTS": str(N_VARIANTS)},
            timeout_s=max(45.0, remaining * 0.8),
        )
        if result is not None:
            result["note"] = "cpu-platform fallback (accelerator unreachable)"
    if result is None:
        remaining = budget - (time.time() - t_start)
        os.environ["HH_BENCH_HOSTONLY_S"] = str(max(30.0, remaining * 0.8))
        result = bench_host_only(vcf, sample, threads)
    _emit(result)


def _jax_cache_config() -> None:
    """Enable the persistent compilation cache for every compile (the env
    var JAX_COMPILATION_CACHE_DIR is set at module import, before jax)."""
    import jax

    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:
        log(f"compilation cache config unavailable: {exc}")


def main() -> None:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # some images pre-import jax pinned to an accelerator platform via
        # sitecustomize, which overrides the env var; re-pin via config
        # before any backend initializes so the CPU fallback really is CPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    _jax_cache_config()
    from haplohyped_tpu.utils.malloc_tune import (
        enable_thp,
        prefault_arena,
        tune_malloc,
    )

    tune_malloc()  # this rig faults fresh pages at ~27 MB/s; reuse arenas
    if enable_thp():  # 2 MB faults: 512x fewer hypervisor round-trips
        log("transparent hugepages enabled (system-wide)")
    # absorb the arena's first-touch cost (0.2-2s of hypervisor page
    # provisioning for the whole-genome stage's ~400 MB working set)
    # behind the minutes of stages that run before it
    prefault_arena(512 << 20)
    # 3x oversubscription hides chunk imbalance + page-fault stalls in the
    # native framer (r5 sweep on the 2-core host: 0.356s at 2 threads,
    # 0.264s at 4, 0.228s at 6, plateau ~0.22s beyond — the extra threads
    # absorb inflate/scan stalls, not cores)
    threads = max(6, 3 * (os.cpu_count() or 1))
    vcf, sample = ensure_corpus()
    budget = float(os.environ.get("HH_BENCH_BUDGET_S", 480))
    # 0.8x: the orchestrator hands each worker a budget equal to its own
    # subprocess timeout, so the watchdog must fire strictly before that
    t_start = time.time()
    _watchdog(budget * 0.8)

    def time_left() -> float:
        return budget * 0.8 - (time.time() - t_start)

    exec_ok, d2h_ok = device_health()
    # the relay's d2h health FLAPS on minute scales: the worker-start bit
    # goes stale by the time the stages that need d2h run.  Re-probe at
    # stage time with a short TTL (VERDICT r3 #1: one bad relay window
    # must not blank every verified column), bounded so repeated 30s probe
    # timeouts can't eat the stage budget.
    _d2h = {"ok": d2h_ok, "t": time.time(), "probes": 0}

    def d2h_now() -> bool:
        if _d2h["ok"] and time.time() - _d2h["t"] < 75:
            return True
        if _d2h["probes"] >= 5 or time_left() < 45:
            return _d2h["ok"]
        _d2h["probes"] += 1
        was = _d2h["ok"]
        _d2h["ok"] = _d2h_probe_once()
        _d2h["t"] = time.time()
        if _d2h["ok"] and not was:
            log("d2h recovered at stage time; materialized measurements on")
        elif was and not _d2h["ok"]:
            log("d2h went unhealthy at stage time; falling back to upper bounds")
        return _d2h["ok"]

    if exec_ok and d2h_ok:
        # pre-start the converter's link-bandwidth probe so its jax
        # bring-up overlaps the stages that run before whole_genome
        from haplohyped_tpu.pipeline.vcf_to_h5 import _start_d2h_probe

        _start_d2h_probe()
    if not exec_ok:
        # a wedged device would hang block_until_ready; bail so the
        # orchestrator falls back to the CPU platform
        log("worker: device cannot execute; exiting for orchestrator fallback")
        os._exit(4)

    n, e2e_s = bench_parse_encode(vcf, sample, threads, with_d2h=d2h_ok)
    _PARTIAL["value"] = round(n / e2e_s)

    # cheapest-verified-first ordering + hard per-stage caps (VERDICT r4
    # #1): host-side stages that never depend on relay honesty run first;
    # the dispatch-inclusive window shoot-outs — the stages that starved
    # the r4 driver artifact in the relay's slow-dispatch mood — run LAST,
    # where a budget collapse costs only upper-bound numbers.  Each stage
    # gets cap = clamp(fair share of remaining budget, min_time, cap_max),
    # advertised via _STAGE["deadline"] (stage bodies shrink their own
    # iteration counts) and enforced by a thread-join backstop.
    aux_stages = [
        # (name, fn, min_time_s, cap_max_s)
        ("storage", lambda: bench_storage(), 15, 60),
        (
            "cohort_donor_variants_per_sec",
            lambda: round(bench_cohort(vcf, threads)),
            15, 60,
        ),
        ("fasta", lambda: bench_fasta(threads), 20, 90),
        (
            "whole_genome",
            lambda: bench_whole_genome(threads, device_decode=exec_ok and d2h_ok),
            30, 120,
        ),
        (
            "windows_chain",
            # the digest fetch is the attestation; needs healthy d2h
            lambda: bench_windows_chain()
            if d2h_now()
            else {"note": "skipped: d2h unhealthy"},
            25, 120,
        ),
        (
            "window_parity",
            # the fetch IS the attestation; skip outright on a wedged link.
            # parity=None on skip (r4 #7): false is reserved for a MEASURED
            # on-chip mismatch, never for "did not run"
            lambda: bench_window_parity()
            if d2h_now()
            else {"parity": None, "note": "skipped: d2h unhealthy"},
            20, 90,
        ),
        (
            "device_roofline",
            # the stage's anti-eliding design REQUIRES a d2h fetch in the
            # timed region; on a wedged-d2h relay it would hang
            lambda: bench_device_roofline(vcf, sample, threads)
            if d2h_now()
            else {"note": "skipped: d2h unhealthy (stage needs the fetch)"},
            25, 150,
        ),
        (
            "train",
            # the loss fetch is the attestation; needs healthy d2h
            lambda: bench_train()
            if d2h_now()
            else {"note": "skipped: d2h unhealthy"},
            60, 180,
        ),
        (
            "tokenizer",
            # both paths end with host-side columns: a wedged d2h hangs
            lambda: bench_tokenizer(threads)
            if d2h_now()
            else {"note": "skipped: d2h unhealthy"},
            25, 90,
        ),
        ("shootout", lambda: bench_shootout(vcf, sample, threads), 20, 90),
        ("windows", lambda: bench_windows(materialize=d2h_now()), 20, 90),
        ("window_kernels", lambda: bench_window_kernels(materialize=d2h_now()), 25, 120),
    ]

    def _assign_stage(name: str, val) -> None:
        if name == "shootout":
            _PARTIAL["decode12"] = val
            if isinstance(val, dict) and "xla" in val:
                _PARTIAL["decode12_xla_vps"] = val["xla"]["vps"]
                _PARTIAL["decode12_pallas_vps"] = val.get("pallas", {}).get("vps", 0)
        elif name == "windows":
            if isinstance(val, dict) and "codes" in val:
                _PARTIAL["windows_per_sec"] = round(val["codes"])
                _PARTIAL["windows_per_sec_onehot"] = round(val.get("onehot", 0))
                _PARTIAL["windows_materialized"] = val.get("materialized", False)
            else:
                _PARTIAL["windows_note"] = val
        elif name == "window_parity":
            _PARTIAL["window_parity"] = val
            p = val.get("parity") if isinstance(val, dict) else None
            # null = did not run; false ONLY for a measured mismatch (r4 #7)
            _PARTIAL["window_kernel_parity"] = None if p is None else bool(p)
        else:
            _PARTIAL[name] = val

    import threading as _threading

    def run_stage(name: str, fn, cap: float):
        """Run a stage under its cap in a backstop thread.  Returns
        (holder, orphan_thread_or_None); a wedged stage is abandoned (its
        daemon thread keeps running — usually blocked on a dead d2h — and
        its late result is harvested before emit if it ever lands)."""
        _STAGE["deadline"] = time.time() + cap
        holder: dict = {}

        def body():
            try:
                holder["val"] = fn()
            except Exception as exc:  # aux stages must not kill the headline
                holder["exc"] = exc

        th = _threading.Thread(target=body, daemon=True, name=f"stage-{name}")
        th.start()
        th.join(timeout=cap + 30.0)
        return holder, (th if th.is_alive() else None)

    only = os.environ.get("HH_BENCH_STAGES")  # comma list to run a subset
    selected = [
        s for s in aux_stages if not only or s[0] in only.split(",")
    ]
    late: list[tuple[str, dict, object]] = []
    for idx, (name, fn, min_time, cap_max) in enumerate(selected):
        stages_left = len(selected) - idx
        cap = max(min_time, time_left() / stages_left)
        cap = min(cap, cap_max, max(time_left() - 10.0, 5.0))
        if time_left() < min(min_time, 15.0):
            log(f"skipping {name} stage ({time_left():.0f}s left)")
            continue
        holder, orphan = run_stage(name, fn, cap)
        if orphan is not None:
            log(f"{name} stage hit its hard cap ({cap:.0f}s + 30s grace); moving on")
            late.append((name, holder, orphan))
            _assign_stage(name, {"note": f"timed out (cap {cap:.0f}s)"})
            continue
        if "exc" in holder:
            log(f"{name} stage failed: {holder['exc']}")
            continue
        _assign_stage(name, holder["val"])

    def _harvest_late() -> None:
        for name, holder, th in late:
            th.join(timeout=0.5)
            if "val" in holder and not holder.get("used"):
                holder["used"] = True
                log(f"{name} stage finished after its cap; using the late result")
                _assign_stage(name, holder["val"])

    _harvest_late()

    # --- materialization retry pass (VERDICT r3 #1) ----------------------
    # If the d2h-dependent stages ran unmaterialized (bad relay window at
    # stage time) and d2h has since recovered, spend leftover budget
    # converting the upper bounds into verified measurements.
    def _needs_retry(name: str) -> bool:
        if name == "windows":
            return _PARTIAL.get("windows_materialized") is False
        if name == "window_kernels":
            wk = _PARTIAL.get("window_kernels")
            return isinstance(wk, dict) and not wk.get("materialized")
        if name == "window_parity":
            # retry only if the stage never RAN (skip note / absent) — a
            # genuine measured mismatch must not be re-rolled until it
            # passes (it is the only evidence of a real kernel bug)
            wp = _PARTIAL.get("window_parity")
            return not (isinstance(wp, dict) and wp.get("kernels"))
        if name == "device_roofline":
            dr = _PARTIAL.get("device_roofline")
            return not (isinstance(dr, dict) and "gb_per_sec" in dr)
        if name == "windows_chain":
            wc = _PARTIAL.get("windows_chain")
            return not (isinstance(wc, dict) and wc.get("winner") not in (None, "none"))
        return False

    retryable = {n: fn for n, fn, *_ in selected if n in (
        "windows", "window_kernels", "windows_chain", "window_parity",
        "device_roofline")}
    for name, fn in retryable.items():
        if not _needs_retry(name) or time_left() < 60:
            continue
        if not d2h_now():
            break  # still unhealthy; later retries would also hang
        log(f"retry pass: re-running {name} materialized (d2h recovered)")
        _STAGE["deadline"] = time.time() + min(90.0, time_left() - 10.0)
        try:
            val = fn()
            if name == "windows":
                if val.get("materialized"):
                    _assign_stage(name, val)
            else:
                _assign_stage(name, val)
        except Exception as exc:
            log(f"retry of {name} failed: {exc}")

    _harvest_late()  # a wedged stage may have landed while retries ran
    _PARTIAL["emitted"] = True
    _emit(_result_json())


if __name__ == "__main__":
    if os.environ.get("HH_BENCH_WORKER"):
        main()
    else:
        orchestrate()
