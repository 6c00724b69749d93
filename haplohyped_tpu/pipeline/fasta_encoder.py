"""FASTA -> one-hot reference-genome HDF5 pipeline.

Artifact parity with the reference's ``src/haplohyped/fasta_encoder.py``:
per-chromosome temp files holding a ``sequence`` dataset compressed with
Blosc(32001, cd_values ``(0,2,0,0,5,1,2)``), merged into
``reference_genome.h5`` under ``{chrom}/sequence`` (``fasta_encoder.py:91,179``),
chr1..chr22 by default, threaded fan-out, tmp cleanup.  Differences by design:

- the per-base one-hot hot loop (polars ``to_dummies`` over ~250M rows,
  reference ``fasta_encoder.py:47-61``) runs as a jit LUT-gather kernel on the
  accelerator (:func:`haplohyped_tpu.ops.onehot.encode_ascii_onehot`);
- one-hot channel order is the encode-spec order ``[A,C,G,T,N]`` (the
  documented default; the reference's alphabetical sort is defect-adjacent,
  SURVEY §2.9.8);
- an additional int8 ``codes`` dataset is written next to ``sequence`` for
  fast device loading (readers of the reference layout are unaffected).
"""

from __future__ import annotations

import logging
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

import click
import numpy as np

from haplohyped_tpu.core.config import FastaEncodeConfig
from haplohyped_tpu.core.constants import (
    CODES_DATASET_NAME,
    SEQUENCE_DATASET_NAME,
)
from haplohyped_tpu.hostio.fasta import FastaReader
from haplohyped_tpu.storage.blosc import reference_compression_kwargs
from haplohyped_tpu.utils.common_utils import parse_encode_dict

logger = logging.getLogger("haplohyped_tpu.fasta_encoder")

#: chunk rows for the sequence datasets — keeps random window reads cheap
_SEQ_CHUNK_ROWS = 1 << 16


def _encode_host(arr: np.ndarray):
    from haplohyped_tpu.utils.bitpack import index_to_onehot
    from haplohyped_tpu.utils.common_utils import nucleotide_to_index

    codes = nucleotide_to_index(arr.view("|S1"))
    return index_to_onehot(codes), codes


def _encode_onehot_and_codes(raw: bytes, device: bool = True):
    """bytes -> (onehot uint8 (L, C), codes int8 (L,)).

    Link-aware like the converter's decode routing: the one-hot must come
    back to the host for the HDF5 writer (6 bytes out per input byte), and
    a wedged device->host link HANGS device_get (try/except can't catch
    it).  Gate on the subprocess health probe, then project the round-trip
    against a measured host-encode rate; the one-hot is elementwise, so the
    host-rate prefix measurement is kept, never wasted."""
    import time as _time

    arr = np.frombuffer(raw, dtype=np.uint8)
    n = arr.shape[0]
    prefix = None
    if device:
        from haplohyped_tpu.pipeline import vcf_to_h5 as _conv

        device = _conv._device_transfer_healthy(wait_s=0.1)
        if device and n >= (4 << 20) and _conv._d2h_mbps is not None:
            m = 4 << 20
            t0 = _time.time()
            prefix = _encode_host(arr[:m])
            host_rate = m / max(_time.time() - t0, 1e-6)
            t_host = n / host_rate
            # up: n ascii bytes; down: 5n one-hot + n codes; same 2x
            # sustained-rate margin as the converter (vcf_to_h5._decode_v2)
            t_dev = (
                2 * n / (_conv._h2d_mbps * 1e6)
                + 2 * 6 * n / (_conv._d2h_mbps * 1e6)
                + 0.15
            )
            if t_host < t_dev:
                logger.info(
                    "link-aware one-hot: host path (projected device %.2fs "
                    "vs host %.2fs for %d bases)", t_dev, t_host, n,
                )
                oh_rest, codes_rest = _encode_host(arr[m:])
                return (
                    np.concatenate([prefix[0], oh_rest]),
                    np.concatenate([prefix[1], codes_rest]),
                )
    if device:
        try:
            import jax

            from haplohyped_tpu.ops.onehot import ascii_to_codes, codes_to_onehot

            # the probe's host-encoded prefix is reused here too: the
            # device only encodes the remainder (elementwise op, so the
            # split is seamless)
            rest = arr if prefix is None else arr[4 << 20 :]
            codes = ascii_to_codes(jax.numpy.asarray(rest))
            onehot = codes_to_onehot(codes)
            oh = np.asarray(jax.device_get(onehot))
            cd = np.asarray(jax.device_get(codes))
            if prefix is not None:
                oh = np.concatenate([prefix[0], oh])
                cd = np.concatenate([prefix[1], cd])
            return oh, cd
        except Exception as exc:  # pragma: no cover - device fallback
            logger.warning("device one-hot failed (%s); using numpy", exc)
    return _encode_host(arr)


class ReferenceGenome:
    """Encode a reference FASTA into per-chromosome one-hot HDF5 files."""

    def __init__(
        self,
        fasta_file: str | None = None,
        encode_spec=None,
        hdf5_file: str | None = None,
        output_dir: str | None = None,
        device: bool = True,
        write_codes: bool = True,
        write_workers: int | None = None,
    ):
        self.encode_spec = parse_encode_dict(encode_spec)
        self.output_dir = output_dir
        self.fasta_file = fasta_file
        self.hdf5_file = hdf5_file
        self.device = device
        self.write_codes = write_codes
        self.write_workers = write_workers or (os.cpu_count() or 4)
        self.genome_files: list[tuple[str, str]] = []

    def encode_sequence(self, seq_data, ignore_case: bool = True) -> np.ndarray:
        from haplohyped_tpu.utils.common_utils import encode_sequence

        return encode_sequence(seq_data, self.encode_spec, ignore_case)

    def load_chromosome(self, chrom: str) -> tuple[str, str]:
        """Encode one chromosome into ``{output_dir}/{chrom}.h5``."""
        import h5py

        logger.info(f"Encoding chromosome {chrom} from FASTA file {self.fasta_file}")
        fasta = FastaReader(self.fasta_file)
        try:
            raw = fasta.fetch(chrom)
        finally:
            fasta.close()
        onehot, codes = _encode_onehot_and_codes(raw, device=self.device)
        tmp_h5_file = os.path.join(self.output_dir, f"{chrom}.h5")
        n_ch = onehot.shape[1] if onehot.size else len(self.encode_spec)
        from haplohyped_tpu.storage.fastwrite import write_dataset_direct

        with h5py.File(tmp_h5_file, "w") as f:
            # direct-chunk writer: LZ4HC runs in a thread pool OUTSIDE the
            # HDF5 global lock (the per-chromosome threads otherwise
            # serialize on it)
            write_dataset_direct(
                f,
                SEQUENCE_DATASET_NAME,
                onehot,
                reference_compression_kwargs(
                    chunks=(min(_SEQ_CHUNK_ROWS, max(1, onehot.shape[0])), n_ch)
                ),
                workers=self.write_workers,
            )
            if self.write_codes:
                write_dataset_direct(
                    f,
                    CODES_DATASET_NAME,
                    codes,
                    reference_compression_kwargs(
                        chunks=(min(_SEQ_CHUNK_ROWS * 4, max(1, codes.shape[0])),)
                    ),
                    workers=self.write_workers,
                )
        logger.info(f"Finished encoding and saving chromosome {chrom} to {tmp_h5_file}")
        return chrom, tmp_h5_file

    def load_genome_parallel(self, chromosomes=None, cores: int | None = None):
        chrom_list = list(chromosomes) if chromosomes else [f"chr{i}" for i in range(1, 23)]
        logger.info("Starting parallel encoding of genome")
        with ThreadPoolExecutor(max_workers=cores or os.cpu_count()) as executor:
            results = list(executor.map(self.load_chromosome, chrom_list))
        self.genome_files = [(chrom, path) for chrom, path in results]
        logger.info("Finished parallel encoding of genome")
        return self.genome_files

    def get_sequence(self, chrom: str, start: int, end: int) -> np.ndarray:
        import h5py

        path = dict(self.genome_files)[chrom]
        with h5py.File(path, "r") as f:
            return np.array(f[SEQUENCE_DATASET_NAME][start:end], dtype=np.int8)


class HDF5Handler:
    """Merge per-chromosome temp files into one reference HDF5."""

    @staticmethod
    def merge_h5_files(tmp_dir: str, final_h5_file: str, cores: int | None = None) -> None:
        import h5py

        logger.info(f"Merging HDF5 files from {tmp_dir} to {final_h5_file}")
        with h5py.File(final_h5_file, "a") as final_file:
            for tmp_file in sorted(os.listdir(tmp_dir)):
                if not tmp_file.endswith(".h5"):
                    continue
                chrom = tmp_file[: -len(".h5")]
                tmp_path = os.path.join(tmp_dir, tmp_file)
                with h5py.File(tmp_path, "r") as tmp:
                    grp = final_file.require_group(chrom)
                    for dset in tmp.keys():
                        if dset in grp:
                            del grp[dset]
                        tmp.copy(dset, grp, name=dset)
        logger.info("Finished merging HDF5 files")

    @staticmethod
    def load_from_hdf5(hdf5_file: str) -> dict[str, np.ndarray]:
        import h5py

        out = {}
        with h5py.File(hdf5_file, "r") as f:
            for chrom in f.keys():
                out[chrom] = f[chrom][SEQUENCE_DATASET_NAME][()]
        return out


def encode_fasta(cfg: FastaEncodeConfig) -> str:
    """Library entry: run the full FASTA encode under a config."""
    from haplohyped_tpu.storage.blosc import set_blosc_nthreads

    set_blosc_nthreads(cfg.cores)
    os.makedirs(cfg.tmp_dir, exist_ok=True)
    # the merge appends into the final file; a leftover artifact from a
    # previous run would contribute stale chromosome groups
    if os.path.exists(cfg.final_h5_path):
        os.remove(cfg.final_h5_path)
    try:
        ref = ReferenceGenome(
            fasta_file=cfg.fasta_path,
            output_dir=cfg.tmp_dir,
            write_codes=cfg.write_codes,
        )
        fasta = FastaReader(cfg.fasta_path)
        present = set(fasta.names())
        fasta.close()
        chroms = [c for c in cfg.chromosomes if c in present]
        missing = [c for c in cfg.chromosomes if c not in present]
        if missing:
            logger.warning("chromosomes absent from FASTA, skipped: %s", missing)
        ref.load_genome_parallel(chromosomes=chroms, cores=cfg.cores)
        HDF5Handler.merge_h5_files(cfg.tmp_dir, cfg.final_h5_path, cores=cfg.cores)
    finally:
        shutil.rmtree(cfg.tmp_dir, ignore_errors=True)
    logger.info(f"Reference genome HDF5 file created at {cfg.final_h5_path}")
    return cfg.final_h5_path


@click.command()
@click.option("--fasta", required=True, type=click.Path(exists=True), help="Reference FASTA")
@click.option("--outdir", required=True, type=click.Path(), help="Output folder")
@click.option("--cores", default=os.cpu_count(), type=int, help="Worker threads")
@click.option(
    "--chromosomes",
    default=None,
    type=str,
    help="Comma-separated chromosome names (default chr1..chr22)",
)
def main(fasta, outdir, cores, chromosomes):
    """Encode a reference genome FASTA into a one-hot HDF5."""
    logging.basicConfig(level=logging.INFO)
    cfg = FastaEncodeConfig(fasta_path=fasta, out_dir=outdir, cores=cores)
    if chromosomes:
        cfg = cfg.replace(chromosomes=tuple(chromosomes.split(",")))
    encode_fasta(cfg)


if __name__ == "__main__":
    main()
