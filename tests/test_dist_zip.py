"""The committed deployable zip must match the worktree.

dist/jsonld_spark.zip is what spark-submit --py-files ships; a stale
zip silently runs OLD code (round-6 review caught exactly this:
oracle_sql() crashed under the zip because a new module function was
missing).  This guard fails whenever a package file changes without
`python scripts/make_pyfiles.py` being re-run."""

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_zip_matches_worktree():
    zpath = REPO / "dist" / "jsonld_spark.zip"
    assert zpath.exists(), "dist/jsonld_spark.zip missing — run scripts/make_pyfiles.py"
    with zipfile.ZipFile(zpath) as z:
        names = [n for n in z.namelist() if n.endswith(".py")]
        stale = []
        for n in names:
            src = REPO / n
            if not src.exists():
                stale.append(f"{n}: in zip but not in worktree")
                continue
            if z.read(n) != src.read_bytes():
                stale.append(f"{n}: zip content differs from worktree")
        # every worktree package file must be in the zip too
        for src in (REPO / "jsonld_spark").rglob("*.py"):
            rel = str(src.relative_to(REPO))
            if rel not in names:
                stale.append(f"{rel}: in worktree but not in zip")
    assert not stale, (
        "STALE DEPLOYABLE ZIP — run `python scripts/make_pyfiles.py` "
        "and commit dist/jsonld_spark.zip:\n" + "\n".join(stale)
    )
