"""spark-submit --py-files deployment e2e.

North rule: "run via spark-submit --py-files on a multi-executor cluster".
This test exercises the real deployment shape, not an in-process import:
the package is zipped (as the engine/main.py docstring instructs), the
driver file is copied OUT of the repo checkout into a neutral scratch dir,
PYTHONPATH is stripped, and a genuine ``spark-submit --py-files egs.zip``
subprocess runs two crawl rounds.  Package imports can only resolve from
the zip — exactly what a cluster executor sees.

Asserts:
1. the subprocess succeeds (relative-import / missing-conf regressions in
   engine/main.py fail here, nowhere else in the suite),
2. round 1 reports exactly the simulator's post count,
3. round 2 against the same store is incremental (zero new posts),
4. the store written by the subprocess re-opens in-process with the golden
   posts key set and byte-identical extracted text per url.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

from eastmoneygubacrawler_spark.fixtures import simulate_reference_crawl
from eastmoneygubacrawler_spark.storage import SnapshotStore

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "eastmoneygubacrawler_spark"


def _spark_submit_bin() -> Path:
    import pyspark

    return Path(pyspark.__file__).resolve().parent / "bin" / "spark-submit"


def _zip_package(dest: Path) -> None:
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(PKG.rglob("*.py")):
            zf.write(f, f.relative_to(REPO))


@pytest.fixture(scope="module")
def submitted(corpus, corpus_dir, tmp_path_factory):
    submit = _spark_submit_bin()
    if not submit.exists():  # pragma: no cover - environment guard
        pytest.skip("spark-submit launcher not shipped with this pyspark")

    work = tmp_path_factory.mktemp("deploy")
    egs_zip = work / "egs.zip"
    _zip_package(egs_zip)
    driver = work / "main.py"  # bare driver script, outside the checkout
    shutil.copyfile(PKG / "engine" / "main.py", driver)
    store_dir = work / "store"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    cmd = [
        str(submit),
        "--master", "local[4]",
        "--driver-memory", "4g",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(egs_zip),
        str(driver),
        "--pages", f"{corpus_dir}/pages.parquet",
        "--seeds", f"{corpus_dir}/seeds.parquet",
        "--robots", f"{corpus_dir}/robots.parquet",
        "--politeness", f"{corpus_dir}/politeness.parquet",
        "--store", str(store_dir),
        "--rounds", "2",
        "--n-shards", "16",
        "--fetch-partitions", "4",
    ]
    proc = subprocess.run(
        cmd, cwd=work, env=env, capture_output=True, text=True, timeout=540
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-4000:]}"

    rounds = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "round" in d:
                rounds.append(d)
    golden = simulate_reference_crawl(corpus)
    return {"rounds": rounds, "store_dir": store_dir, "golden": golden}


def test_two_rounds_reported(submitted):
    assert [r["round"] for r in submitted["rounds"]] == [0, 1]


def test_round1_matches_simulator_post_count(submitted):
    assert submitted["rounds"][0]["posts_new"] == len(submitted["golden"]["posts"])


def test_round2_is_incremental(submitted):
    assert submitted["rounds"][1]["posts_new"] == 0


def test_store_reopens_with_golden_posts_and_texts(spark, submitted):
    store = SnapshotStore(str(submitted["store_dir"]))
    rows = store.load(spark, "posts").select(
        "stock_code", "content_type", "url_id", "url", "full_text"
    ).collect()
    got = {(r.stock_code, r.content_type, r.url_id) for r in rows}
    exp = {
        (p["stock_code"], p["content_type"], p["url_id"])
        for p in submitted["golden"]["posts"]
    }
    assert got == exp

    exp_texts = {p["url"]: p["full_text"] for p in submitted["golden"]["posts"]}
    got_texts = {r.url: r.full_text for r in rows}
    assert got_texts == exp_texts
