"""datasets_info() tests (reference DatasetInfo surface)."""

import datachain_spark as dc
from datachain_spark.chain import Chain
from datachain_spark.dataset_info import datasets_info


def test_datasets_info_stats_and_versions(spark, tmp_path):
    cat = str(tmp_path / "cat")
    ch = dc.read_values(spark, id=[1, 2, 3, 4], name=["a", "b", "c", "d"])
    saved = Chain(ch.df, catalog_root=cat).save("pets")
    Chain(saved.df.filter("id <= 2"), catalog_root=cat).save("pets")  # v2

    ns_ch = dc.read_values(spark, x=[10, 20])
    from datachain_spark.namespaces import create_namespace, create_project

    create_namespace(cat, "team")
    create_project(cat, "team", "vision")
    Chain(ns_ch.df, catalog_root=cat).save("team.vision.samples")

    info = {r["name"]: r for r in datasets_info(spark, cat).collect()}
    assert set(info) == {"pets", "samples"}

    pets = info["pets"]
    assert pets["namespace"] == "local" and pets["num_versions"] == 2
    assert pets["num_objects"] == 2  # live snapshot, not v1
    assert pets["size"] > 0 and pets["created_at"] is not None
    assert pets["version"] and pets["version"].startswith("v")

    samples = info["samples"]
    assert samples["namespace"] == "team" and samples["project"] == "vision"
    assert samples["num_objects"] == 2

    only_team = datasets_info(spark, cat, namespace="team").collect()
    assert [r["name"] for r in only_team] == ["samples"]
