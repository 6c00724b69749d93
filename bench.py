#!/usr/bin/env python
"""Benchmark: variants/sec/chip for the parse+encode path (+ sampler windows).

Prints ONE JSON line:
  {"metric": "variants/sec/chip (parse+encode)", "value": N,
   "unit": "variants/sec", "vs_baseline": N / 559390}

Baseline: the reference's published single-core htslib parse throughput
(559,390 variants/sec — reference README.md:118).  Here "parse+encode" is the
full replacement path: multithreaded native framing (libdeflate BGZF decode +
compact 12-byte record framing) -> host->device transfer -> jit decode kernel
(integer parse, SNP predicate, genotype/phase decode).  Every timed iteration
mutates one input byte so a caching execution relay cannot elide the device
work; the headline is the better of the staged (host + device serialized) and
pipelined (host framing overlapped with device decode, the converter's
steady state across donorxchrom tasks) measurements.

Runs on whatever accelerator JAX finds (real TPU under the driver; CPU
elsewhere).  Details go to stderr; the JSON line is the last stdout line.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import time

import numpy as np

BASELINE_VARIANTS_PER_SEC = 559_390
BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data")
N_VARIANTS = int(os.environ.get("HH_BENCH_VARIANTS", 2_000_000))
N_SAMPLES = 3


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def device_health(timeout_s: float = 30.0, retries: int = 3) -> tuple[bool, bool]:
    """Probe device execute and device->host transfer on a daemon thread
    (relayed TPUs can wedge on either; a hung probe must not hang bench).

    Returns ``(exec_ok, d2h_ok)``.  A device that cannot even execute is
    useless for this bench — the caller should fall back to the CPU
    platform.  A device that executes but wedges on d2h can still run the
    block_until_ready-only stages (``with_d2h=False``)."""
    import threading

    for attempt in range(retries):
        state = {"exec": False, "d2h": False}

        def probe():
            try:
                import jax
                import jax.numpy as jnp

                x = jnp.arange(16) * 2
                jax.block_until_ready(x)
                state["exec"] = True
                state["d2h"] = int(np.asarray(jax.device_get(x))[1]) == 2
            except Exception as exc:
                log(f"device probe exception: {exc}")

        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(timeout=timeout_s)
        if state["exec"] and state["d2h"]:
            return True, True
        log(
            f"device probe attempt {attempt + 1}/{retries}: "
            f"exec={state['exec']} d2h={state['d2h']}"
        )
        if attempt < retries - 1:
            time.sleep(5)
    if not state["exec"]:
        log("WARNING: device cannot execute; caller should fall back to CPU")
    elif not state["d2h"]:
        log("WARNING: device->host transfer unhealthy; skipping d2h-dependent stages")
    return state["exec"], state["d2h"]


def bgzf_write(path: str, text: bytes, level: int = 1) -> None:
    """Write bytes as BGZF (64KB gzip blocks with BC extra field) so the
    native reader can decompress blocks in parallel — the real-world format
    of bcftools-produced ``.vcf.gz`` cohort files.  Thin alias over the
    canonical writer in ``haplohyped_tpu.hostio.bgzf``."""
    import os as _os

    from haplohyped_tpu.hostio.bgzf import bgzf_write as _bw

    _bw(path, text, level=level, threads=min(8, _os.cpu_count() or 1))


def ensure_corpus() -> tuple[str, str]:
    """Generate (once) a large synthetic single-chrom BGZF VCF + sample."""
    os.makedirs(BENCH_DIR, exist_ok=True)
    vcf = os.path.join(BENCH_DIR, f"bench_chr1_{N_VARIANTS}.bgzf.vcf.gz")
    sample = "bench-sample-0000"
    if os.path.exists(vcf):
        return vcf, sample
    log(f"generating bench corpus: {N_VARIANTS} variants ...")
    rng = np.random.default_rng(0)
    t0 = time.time()
    samples = [f"bench-sample-{i:04d}" for i in range(N_SAMPLES)]
    bases = np.array(list("ACGT"))
    positions = np.cumsum(rng.integers(50, 200, size=N_VARIANTS)) + 10_000
    refs = bases[rng.integers(0, 4, size=N_VARIANTS)]
    alt_off = rng.integers(1, 4, size=N_VARIANTS)
    alts = bases[(np.searchsorted(bases, refs) + alt_off) % 4]
    gts = np.array(["0|0", "0|1", "1|0", "1|1"])[
        rng.integers(0, 4, size=(N_VARIANTS, N_SAMPLES))
    ]
    parts = [
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr1,length=400000000>\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(samples)
        + "\n"
    ]
    CHUNK = 100_000
    for lo in range(0, N_VARIANTS, CHUNK):
        hi = min(lo + CHUNK, N_VARIANTS)
        rows = [
            f"chr1\t{positions[i]}\trs{i}\t{refs[i]}\t{alts[i]}\t.\tPASS\t.\tGT\t"
            + "\t".join(gts[i])
            for i in range(lo, hi)
        ]
        parts.append("\n".join(rows) + "\n")
    bgzf_write(vcf, "".join(parts).encode())
    log(f"corpus generated in {time.time() - t0:.1f}s -> {vcf}")
    return vcf, sample


def bench_parse_encode(
    vcf: str, sample: str, threads: int, with_d2h: bool = True
) -> tuple[int, float]:
    """Primary path: native compact framing -> upload -> jit decode kernel.

    Measures (a) staged host+device and (b) pipelined steady state (host
    framing of task k+1 overlapped with device decode of task k — the
    converter's behavior across donorxchrom tasks).  Returns
    (n_variants, best_e2e_seconds_per_task).
    """
    import queue
    import threading

    import jax

    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.hostio.frame_format import R12_GT_OFF
    from haplohyped_tpu.ops.vcf_decode import decode_frames12

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # --- host stage: BGZF decode + compact framing (best of 3) --------
    host_s = []
    rec = chroms = None
    for _ in range(3):
        t0 = time.time()
        rec, chroms, seen = native.vcf_frame12(vcf, sample, None, threads=threads)
        host_s.append(time.time() - t0)
    host_best = min(host_s)
    n = rec.shape[0]
    log(
        f"host decompress+frame12: {[f'{t:.3f}' for t in host_s]}s "
        f"(best {host_best:.3f}) for {n} records ({rec.nbytes / 1e6:.0f} MB), "
        f"chroms={chroms}"
    )

    # --- compile ------------------------------------------------------
    t0 = time.time()
    out = decode_frames12(jax.device_put(rec, dev))
    jax.block_until_ready(out)
    log(f"upload+decode compile+first run: {time.time() - t0:.1f}s")

    # --- upload + device decode (fresh, mutated buffers each iteration
    # so a caching execution relay cannot elide the real work) ----------
    dev_s = []
    for i in range(6):
        r = rec.copy()
        r[i % n, R12_GT_OFF] ^= 1  # content differs every iteration
        t0 = time.time()
        out = decode_frames12(jax.device_put(r, dev))
        jax.block_until_ready(out)
        dev_s.append(time.time() - t0)
    dev_best = min(dev_s)
    snps = (
        f"{int(np.asarray(out['snp_mask']).sum())} SNPs" if with_d2h else "d2h skipped"
    )
    log(
        f"upload+decode: {[f'{t:.3f}' for t in dev_s]}s (best {dev_best:.3f}) "
        f"= {n / dev_best:,.0f} variants/s ({snps})"
    )

    staged = host_best + dev_best
    log(
        f"staged parse+encode: {n} variants in {staged:.3f}s "
        f"(host {host_best:.3f} + upload+device {dev_best:.3f}) "
        f"= {n / staged:,.0f} variants/s"
    )

    # --- pipelined steady state: producer thread frames task k+1 while
    # the device uploads+decodes task k -------------------------------
    rounds = 4
    q: queue.Queue = queue.Queue(maxsize=1)

    def producer():
        for k in range(rounds):
            r_k, _, _ = native.vcf_frame12(vcf, sample, None, threads=threads)
            r_k[k % n, R12_GT_OFF] ^= 1
            q.put(r_k)
        q.put(None)

    t0 = time.time()
    th = threading.Thread(target=producer, daemon=True)
    th.start()
    outs = []
    while True:
        r_k = q.get()
        if r_k is None:
            break
        outs.append(decode_frames12(jax.device_put(r_k, dev)))
    jax.block_until_ready(outs)
    th.join()
    pipe = (time.time() - t0) / rounds
    log(
        f"pipelined parse+encode ({rounds} tasks overlapped): "
        f"{pipe:.3f}s/task = {n / pipe:,.0f} variants/s"
    )

    best = min(staged, pipe)
    if os.environ.get("HH_BENCH_TOKENIZER"):
        best = min(best, bench_tokenizer_path(vcf, sample, threads, with_d2h))
    log(f"end-to-end parse+encode best: {n / best:,.0f} variants/s")
    return n, best


def bench_tokenizer_path(
    vcf: str, sample: str, threads: int, with_d2h: bool = True
) -> float:
    """Secondary path (HH_BENCH_TOKENIZER=1): raw-text on-device tokenizer —
    host does only decompress+newline-index, the accelerator does all tab
    scanning.  Ships the whole text, so it is upload-bound on tunneled
    devices.  Returns best e2e seconds."""
    import jax

    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.ops.vcf_tokenize import choose_window, tokenize_lines

    dev = jax.devices()[0]

    # --- host stage: decompress (threaded BGZF) + newline indexing ----
    host_s = []
    vt = None
    for _ in range(3):
        if vt is not None:
            vt.close()
        t0 = time.time()
        vt = native.vcf_text(vcf, threads=threads)
        host_s.append(time.time() - t0)
    host_best = min(host_s)
    n = vt.n_lines
    sample_col = vt.samples.index(sample)
    W = choose_window(int(vt.line_lengths.max()))
    log(
        f"host decompress+index: {[f'{t:.3f}' for t in host_s]}s "
        f"(best {host_best:.3f}) for {n} lines, W={W}"
    )

    # --- upload + device tokenize (fresh buffers each iteration so a
    # caching execution relay can't elide the real work) ---------------
    offs32 = vt.line_offsets.astype(np.int32)
    T = vt.text.shape[0]
    pad_to = (-(-T // W) + 1) * W
    text_padded = np.zeros(pad_to, dtype=np.uint8)
    text_padded[:T] = vt.text

    t0 = time.time()
    text_dev = jax.device_put(text_padded, dev)
    offs_dev = jax.device_put(offs32, dev)
    lens_dev = jax.device_put(vt.line_lengths, dev)
    out = tokenize_lines(text_dev, offs_dev, lens_dev, W=W, sample_col=sample_col)
    jax.block_until_ready(out)
    log(f"upload+tokenize compile+first run: {time.time() - t0:.1f}s")

    dev_s = []
    for i in range(2):
        text_in = text_padded.copy()
        # flip a padding byte (masked out of every window): outputs are
        # unchanged but content differs -> a caching relay must re-execute
        text_in[-1] ^= i + 1
        t0 = time.time()
        text_dev = jax.device_put(text_in, dev)
        offs_dev = jax.device_put(offs32.copy(), dev)
        lens_dev = jax.device_put(vt.line_lengths.copy(), dev)
        out = tokenize_lines(text_dev, offs_dev, lens_dev, W=W, sample_col=sample_col)
        jax.block_until_ready(out)
        dev_s.append(time.time() - t0)
    dev_best = min(dev_s)
    snps = f"{int(np.asarray(out['snp_mask']).sum())} SNPs" if with_d2h else "d2h skipped"
    log(
        f"tokenizer upload+tokenize: {[f'{t:.3f}' for t in dev_s]}s "
        f"(best {dev_best:.3f}) = {n / dev_best:,.0f} variants/s ({snps})"
    )
    vt.close()

    e2e = host_best + dev_best
    log(
        f"tokenizer staged parse+encode: {n} variants in {e2e:.3f}s "
        f"(host {host_best:.3f} + upload+device {dev_best:.3f}) "
        f"= {n / e2e:,.0f} variants/s"
    )

    best = e2e
    if with_d2h:
        # --- pipelined streaming path (host decompress overlaps device);
        # device_gets its outputs, so only run when d2h is healthy ---------
        from haplohyped_tpu.ops.vcf_stream import tokenize_vcf_streaming

        t0 = time.time()
        dec = tokenize_vcf_streaming(vcf, sample, threads=threads)
        stream_s = time.time() - t0
        assert int(dec["start"].shape[0]) == n
        log(
            f"tokenizer streaming parse+encode (bounded memory, incl. d2h): "
            f"{stream_s:.3f}s = {n / stream_s:,.0f} variants/s"
        )
        best = min(best, stream_s)
    return best


def bench_windows() -> float:
    """Haplotype windows/sec from the on-device sampler on synthetic tensors."""
    import jax

    from haplohyped_tpu.core.config import SamplerConfig
    from haplohyped_tpu.data.cohort import CohortTensors
    from haplohyped_tpu.data.genome import GenomeTensors
    from haplohyped_tpu.data.sampler import DeviceHaplotypeSampler

    rng = np.random.default_rng(1)
    L_chrom = 10_000_000
    genome = GenomeTensors.from_code_arrays(
        {"chr1": rng.integers(0, 4, size=L_chrom).astype(np.int8)}
    )
    n_var = 100_000
    pos = np.sort(rng.choice(L_chrom - 100, size=n_var, replace=False)).astype(np.int64)
    from haplohyped_tpu.core.constants import SNP_STRUCT_DTYPE

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
        [
            (s := rng.integers(0, L_chrom - 2000, size=256)),
            s + 1500,
        ],
        axis=1,
    )
    B, L = 64, 1000
    sampler = DeviceHaplotypeSampler(
        genome,
        cohort,
        spans,
        SamplerConfig(seq_length=L, batch_size=B, seed=0, max_variants_per_window=64),
    )
    # fused multi-batch dispatch (lax.scan): pays dispatch latency once per
    # n_batches — the per-execution RPC overhead dominates on tunneled TPUs
    # (~80ms/dispatch observed), so fuse much deeper on accelerators where
    # per-batch compute is tiny; keep it small on CPU where compute dominates
    if jax.devices()[0].platform == "cpu":
        n_batches, iters = 16, 3
    else:
        n_batches, iters = 256, 2
    b = sampler.sample_many(n_batches)  # compile
    jax.block_until_ready(b.hap1)
    t0 = time.time()
    outs = [sampler.sample_many(n_batches) for _ in range(iters)]
    jax.block_until_ready([o.hap1 for o in outs])
    dt = (time.time() - t0) / (iters * n_batches)
    wps = B / dt
    log(
        f"sampler (fused x{n_batches}): {B} windows/batch in "
        f"{dt * 1e3:.2f} ms/batch = {wps:,.0f} windows/s"
    )
    return wps


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

    path = tempfile.mktemp(suffix=".h5")
    try:
        t0 = time.time()
        with h5py.File(path, "w") as f:
            f.create_dataset("snp_data", data=data, **cohort_compression_kwargs())
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
        return {"write": wr, "read": rd, "ratio": ratio, "slices": slices}
    finally:
        if os.path.exists(path):
            os.unlink(path)


#: partial results for the watchdog (filled as phases complete)
_PARTIAL: dict = {}


def _emit(result: dict) -> None:
    print(json.dumps(result), flush=True)


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
            out = {
                "metric": "variants/sec/chip (parse+encode)",
                "value": _PARTIAL["value"],
                "unit": "variants/sec",
                "vs_baseline": round(_PARTIAL["value"] / BASELINE_VARIANTS_PER_SEC, 3),
            }
            _emit(out)
        else:
            log("WATCHDOG: no completed measurements; exiting without JSON")
        os._exit(3)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()


def bench_host_only(vcf: str, sample: str, threads: int) -> dict:
    """Last-resort measurement that touches no accelerator: native compact
    framing + the numpy reference decode.  A complete, honest parse+encode
    (same outputs as the device kernel), just on the host CPU."""
    from haplohyped_tpu.hostio import native
    from haplohyped_tpu.ops.vcf_decode import decode_frames12_numpy

    best = None
    deadline = time.time() + float(os.environ.get("HH_BENCH_HOSTONLY_S", 120))
    for it in range(3):
        t0 = time.time()
        rec, chroms, _ = native.vcf_frame12(vcf, sample, None, threads=threads)
        dec = decode_frames12_numpy(rec)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if it == 0 and time.time() + dt > deadline:
            break  # bounded: never blow the orchestrator budget re-iterating
    n = rec.shape[0]
    vps = n / best
    log(
        f"host-only parse+encode (frame12 + numpy decode): {n} variants in "
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


def main() -> None:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # some images pre-import jax pinned to an accelerator platform via
        # sitecustomize, which overrides the env var; re-pin via config
        # before any backend initializes so the CPU fallback really is CPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    threads = os.cpu_count() or 1
    vcf, sample = ensure_corpus()
    # 0.8x: the orchestrator hands each worker a budget equal to its own
    # subprocess timeout, so the watchdog must fire strictly before that
    _watchdog(float(os.environ.get("HH_BENCH_BUDGET_S", 480)) * 0.8)

    exec_ok, d2h_ok = device_health()
    if not exec_ok:
        # a wedged device would hang block_until_ready; bail so the
        # orchestrator falls back to the CPU platform
        log("worker: device cannot execute; exiting for orchestrator fallback")
        os._exit(4)
    n, e2e_s = bench_parse_encode(vcf, sample, threads, with_d2h=d2h_ok)
    e2e_vps = n / e2e_s
    _PARTIAL["value"] = round(e2e_vps)

    try:
        wps = bench_windows()
    except Exception as exc:  # sampler bench is auxiliary
        log(f"window bench failed: {exc}")
        wps = None

    try:
        bench_storage()
    except Exception as exc:  # auxiliary
        log(f"storage bench failed: {exc}")

    result = {
        "metric": "variants/sec/chip (parse+encode)",
        "value": round(e2e_vps),
        "unit": "variants/sec",
        "vs_baseline": round(e2e_vps / BASELINE_VARIANTS_PER_SEC, 3),
    }
    if wps is not None:
        result["windows_per_sec"] = round(wps)
    _PARTIAL["emitted"] = True
    _emit(result)


if __name__ == "__main__":
    if os.environ.get("HH_BENCH_WORKER"):
        main()
    else:
        orchestrate()
