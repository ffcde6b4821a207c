from __future__ import annotations

from collections import defaultdict

from twinspect_spark.queries import q_scd2_file_history

SF = "/root/testdata/sf0.001"


def test_scd2_invariants(spark):
    rows = q_scd2_file_history(spark, SF).collect()
    by_path = defaultdict(list)
    for r in rows:
        by_path[(r["repo"], r["path"])].append(r)

    for key, vs in by_path.items():
        vs.sort(key=lambda r: r["version_seq"])
        doc_id = int(key[1].split("/")[1])
        # version 1 is the initial commit, always present
        assert vs[0]["version_seq"] == 1 and vs[0]["valid_from"] == 1
        # exactly one current version; intervals chain without gaps
        assert sum(1 for r in vs if r["is_current"]) == 1
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["sha_content"] != b["sha_content"]
        # a no-op touch (doc_id%3!=0, %7==0 at commit 2) opens NO version
        if doc_id % 3 != 0 and doc_id % 7 == 0:
            assert all(r["valid_from"] != 2 for r in vs)
        # an edit at commit 2 does
        if doc_id % 3 == 0:
            assert any(r["valid_from"] == 2 for r in vs)
        if doc_id % 5 == 0:
            assert vs[-1]["valid_from"] == 3
