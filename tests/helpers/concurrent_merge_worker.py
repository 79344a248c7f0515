"""Subprocess worker for the concurrent-writer warehouse test: opens its own
SparkSession (separate JVM = a genuinely independent writer process), waits
for the shared 'go' barrier, then merge-upserts its tagged rows into the
shared bucketed table."""

import os
import sys
import time

repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo_root)

from medical_doc_knowledge_graph_system_spark.session import get_spark  # noqa: E402
from medical_doc_knowledge_graph_system_spark.sources.warehouse import (  # noqa: E402
    Warehouse,
)


def main() -> None:
    tag, root = sys.argv[1], sys.argv[2]
    spark = get_spark(f"concurrent_merge_{tag}", cores=2, shuffle_partitions=4)
    wh = Warehouse(root)
    with open(os.path.join(root, f"ready_{tag}"), "w"):
        pass
    deadline = time.time() + 120
    while not os.path.exists(os.path.join(root, "go")):
        if time.time() > deadline:
            raise TimeoutError("barrier never opened")
        time.sleep(0.05)
    df = spark.createDataFrame(
        [(f"{tag}{i}", ord(tag[0])) for i in range(4)], "url string, v int"
    )
    wh.merge_upsert(df, "t", ["url"])
    print(f"DONE {tag}")


if __name__ == "__main__":
    main()
