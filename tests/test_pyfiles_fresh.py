"""The spark-submit --py-files artifact must ship the code at HEAD.

dist/graphforge_spark.zip is what executors import on a real cluster
(tools/submit_job.py passes it via --py-files). Twice in this repo's
history a source change landed without a zip rebuild, which would have
shipped stale operator code to executors while local tests ran the new
code. This test makes that drift a test failure instead of a silent
deploy hazard: every .py under graphforge_spark/ must be present in the
zip byte-for-byte, and the zip must not carry files that no longer
exist on disk.
"""

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
ZIP = ROOT / "dist" / "graphforge_spark.zip"


def test_pyfiles_zip_matches_working_tree():
    assert ZIP.exists(), (
        "dist/graphforge_spark.zip missing — run: python tools/make_pyfiles.py"
    )
    with zipfile.ZipFile(ZIP) as z:
        # full namelist (not just .py): a non-.py member smuggled into the
        # artifact must flag as orphaned, not slip past a .py-only filter
        in_zip = {n for n in z.namelist() if not n.endswith("/")}
        on_disk = {
            # as_posix: zip member names always use '/', Path.relative_to
            # would yield '\\' on Windows and spuriously fail everything
            p.relative_to(ROOT).as_posix()
            for p in (ROOT / "graphforge_spark").rglob("*.py")
            if "__pycache__" not in p.parts
        }
        missing = sorted(on_disk - in_zip)
        orphaned = sorted(in_zip - on_disk)
        stale = sorted(
            n for n in (in_zip & on_disk) if z.read(n) != (ROOT / n).read_bytes()
        )
    assert not missing and not orphaned and not stale, (
        f"py-files zip out of date (rebuild with tools/make_pyfiles.py): "
        f"missing={missing} orphaned={orphaned} stale={stale}"
    )
