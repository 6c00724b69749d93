"""Environment check CLI (the reference ships ``check_paths.py`` that
validates hardcoded author-machine paths; this validates the actual runtime
capabilities instead)."""

from __future__ import annotations

import click


def run_checks() -> list[tuple[str, bool, str]]:
    checks: list[tuple[str, bool, str]] = []

    def add(name: str, fn):
        try:
            ok, detail = fn()
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, str(exc)
        checks.append((name, ok, detail))

    def _native():
        from haplohyped_tpu.hostio import native_available

        return native_available(), "libhh_hostio.so loaded" if native_available() else "built? run cpp/Makefile"

    def _blosc():
        from haplohyped_tpu.storage import blosc_available

        ok = blosc_available()
        return ok, "HDF5 filter 32001 registered" if ok else "falling back to gzip"

    def _jax():
        import jax

        devs = jax.devices()
        return len(devs) > 0, f"{len(devs)} device(s): {devs[0].platform}"

    def _h5py():
        import h5py

        return True, f"h5py {h5py.__version__} / HDF5 {h5py.version.hdf5_version}"

    def _decode():
        import numpy as np

        from haplohyped_tpu.hostio.frame_format import pack_frame
        from haplohyped_tpu.ops.vcf_decode import decode_frames_numpy

        d = decode_frames_numpy(
            np.stack([pack_frame(b"chr1", b"100", b"A", b"G", b"1|0")])
        )
        return bool(d["snp_mask"][0] and d["phase1"][0] == 1), "decode sanity"

    add("native hostio", _native)
    add("blosc filter", _blosc)
    add("jax devices", _jax)
    add("h5py/HDF5", _h5py)
    add("decode kernel", _decode)
    return checks


def run_link_checks() -> list[tuple[str, bool, str]]:
    """Optional diagnostics for fault-bound / tunneled deployments: the
    measured host<->device link bandwidth (what the converter's link-aware
    decode routing sees) and the transparent-hugepage state (what governs
    first-touch page-fault cost for big host buffers)."""
    checks: list[tuple[str, bool, str]] = []

    def _link():
        from haplohyped_tpu.pipeline import vcf_to_h5 as conv

        ok = conv._device_transfer_healthy()
        if not ok:
            return False, "d2h probe failed/stalled — host decode paths in use"
        if conv._h2d_mbps is None:
            return True, "healthy (bandwidth not reported by probe)"
        return True, (
            f"h2d {conv._h2d_mbps:.0f} MB/s, d2h {conv._d2h_mbps:.0f} MB/s "
            "(link-aware routing compares these against host decode rates)"
        )

    def _thp():
        try:
            with open("/sys/kernel/mm/transparent_hugepage/enabled") as f:
                state = f.read().strip()
        except OSError:
            return True, "no THP control (non-Linux?)"
        ok = "[never]" not in state
        return ok, state + (
            "" if "[always]" in state
            else " — big-buffer prefault uses madvise(MADV_HUGEPAGE)"
        )

    try:
        checks.append(("device link", *_link()))
    except Exception as exc:  # noqa: BLE001
        checks.append(("device link", False, str(exc)))
    try:
        checks.append(("hugepages", *_thp()))
    except Exception as exc:  # noqa: BLE001
        checks.append(("hugepages", False, str(exc)))
    return checks


@click.command()
@click.option(
    "--link",
    is_flag=True,
    help="Also probe host<->device link bandwidth and THP state "
    "(spawns a jax subprocess; seconds on healthy links, up to the "
    "probe timeout on wedged ones)",
)
def main(link):
    """Check the runtime environment (native libs, filters, devices)."""
    checks = run_checks()
    if link:
        checks += run_link_checks()
    failed = 0
    for name, ok, detail in checks:
        mark = "✓" if ok else "✗"
        click.echo(f"  {mark} {name:16s} {detail}")
        failed += not ok
    if failed:
        raise SystemExit(1)
    click.echo("all checks passed")


if __name__ == "__main__":
    main()
