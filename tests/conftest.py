import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ontology_loader_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ontology-loader-spark-tests", master="local[4]",
                  extra_confs={"spark.sql.shuffle.partitions": "8",
                               "spark.ui.enabled": "false"})
    yield s
    s.stop()
