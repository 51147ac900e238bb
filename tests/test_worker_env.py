"""Python workers must import quebic_spark even when the driver is
launched from outside the repo (sys.path patched in-process only) —
the round-5 verify pass caught mapInPandas closures failing with
ModuleNotFoundError in exactly that setup; get_spark now exports the
package root on PYTHONPATH before the JVM starts."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
)

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from quebic_spark.session import get_spark
from quebic_spark.operators.multimodal import q_multimodal_decode
spark = get_spark(app_name="worker_env_probe", master="local[2]",
                  shuffle_partitions=2,
                  extra_conf={{"spark.driver.memory": "2g"}})
rows = q_multimodal_decode(spark, {sf!r}).collect()
assert len(rows) > 0
print("WORKER_IMPORT_OK", len(rows))
spark.stop()
"""


def test_udf_closures_import_from_neutral_cwd(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the driver process starts bare
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, sf=SF_DIR)],
        cwd=str(tmp_path),  # NOT the repo — workers can't lean on cwd
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "WORKER_IMPORT_OK" in out.stdout
