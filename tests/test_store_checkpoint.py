"""ObjectStore (moto-mocked S3) + checkpoint/lineage/resume tests —
reference test semantics from object_storage/tests/test_object_store.py."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from geografir_ray.state.object_location import ObjectLocation
from geografir_ray.state.object_store import ObjectStore

moto = pytest.importorskip("moto")
import boto3  # noqa: E402


@pytest.fixture()
def store(tmp_path, monkeypatch):
    # function-scoped fake creds (test_object_store.py:14-30 pattern)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "testing")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "testing")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    with moto.mock_aws():
        client = boto3.client("s3")
        client.create_bucket(Bucket="bkt")
        yield ObjectStore(client), client


def _seed(client, keys):
    for k in keys:
        client.put_object(Bucket="bkt", Key=k, Body=f"body-of-{k}".encode())


def test_list_files(store):
    st, client = store
    _seed(client, ["d/a.txt", "d/b.txt", "d/sub/c.txt", "other/x.txt"])
    got = st.list_files(ObjectLocation(bucket="bkt", path="d/"))
    assert [l.path for l in got] == ["d/a.txt", "d/b.txt", "d/sub/c.txt"]


def test_upload_download_roundtrip(store, tmp_path):
    st, client = store
    src = tmp_path / "f.txt"
    src.write_text("hello")
    st.upload_file(ObjectLocation(bucket="bkt", path="up/f.txt"), str(src))
    out = st.download_file(ObjectLocation(bucket="bkt", path="up/f.txt"), str(tmp_path / ""))
    assert open(out).read() == "hello"
    # custom filename
    out2 = st.download_file(
        ObjectLocation(bucket="bkt", path="up/f.txt"), str(tmp_path), "renamed.txt"
    )
    assert out2.endswith("renamed.txt")


def test_upload_file_missing_local(store):
    st, _ = store
    with pytest.raises(ValueError, match="File not found: /no/such/file."):
        st.upload_file(ObjectLocation(bucket="bkt", path="x"), "/no/such/file")


def test_upload_directory_recursive_and_not(store, tmp_path):
    st, client = store
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_text("a")
    (tmp_path / "sub" / "b.txt").write_text("b")
    st.upload_directory(ObjectLocation(bucket="bkt", path="flat"), str(tmp_path))
    flat = [l.path for l in st.list_files(ObjectLocation(bucket="bkt", path="flat/"))]
    assert flat == ["flat/a.txt"]  # non-recursive: first walk level only
    st.upload_directory(
        ObjectLocation(bucket="bkt", path="deep"), str(tmp_path), recursive=True
    )
    deep = [l.path for l in st.list_files(ObjectLocation(bucket="bkt", path="deep/"))]
    assert deep == ["deep/a.txt", "deep/sub/b.txt"]  # rel paths preserved


def test_download_directory_basename_collision_quirk(store, tmp_path):
    st, client = store
    _seed(client, ["d/one/same.txt", "d/two/same.txt"])
    out = st.download_directory(ObjectLocation(bucket="bkt", path="d/"), str(tmp_path))
    # quirk preserved (object_store.py:237-243): both map to same basename
    assert [os.path.basename(p) for p in out] == ["same.txt", "same.txt"]


def test_remote_file_exists(store):
    st, client = store
    _seed(client, ["x/present.txt"])
    assert st.remote_file_exists(ObjectLocation(bucket="bkt", path="x/present.txt"))
    assert st.remote_file_exists(ObjectLocation(bucket="bkt", path="x/pre"))  # prefix probe
    assert not st.remote_file_exists(ObjectLocation(bucket="bkt", path="x/nope"))


def test_copy_remote_file_and_directory_flatten_quirk(store):
    st, client = store
    _seed(client, ["src/a.txt", "src/sub/b.txt"])
    st.copy_remote_file(
        ObjectLocation(bucket="bkt", path="src/a.txt"),
        ObjectLocation(bucket="bkt", path="dst/a.txt"),
    )
    assert st.remote_file_exists(ObjectLocation(bucket="bkt", path="dst/a.txt"))
    st.copy_remote_directory(
        ObjectLocation(bucket="bkt", path="src/"),
        ObjectLocation(bucket="bkt", path="flatdst"),
    )
    got = sorted(
        l.path for l in st.list_files(ObjectLocation(bucket="bkt", path="flatdst/"))
    )
    # quirk preserved (object_store.py:450-453): subdirs flattened
    assert got == ["flatdst/a.txt", "flatdst/b.txt"]


# --- checkpoint / lineage / resume --------------------------------------


def test_checkpointed_write_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from geografir_ray.state import checkpoint as cp

    out_dir = str(tmp_path / "out")

    def partition_fn(t: pa.Table):
        k = t["id"].to_numpy()
        parts = {}
        for p in np.unique(k % 4):
            parts[str(p)] = t.filter(pa.array(k % 4 == p))
        return parts

    ds = rd.range(1000)
    r1 = cp.checkpointed_write(ds, out_dir, partition_fn, op_version="v1",
                               input_files=["range:1000"])
    assert sorted(r1["written"]) == ["0", "1", "2", "3"]
    assert r1["skipped"] == []

    # lineage records written and well-formed
    lineage = json.load(open(os.path.join(out_dir, "part=0", "lineage.json")))
    assert lineage["op_version"] == "v1"
    assert lineage["row_count"] == 250
    assert lineage["input_files"] == ["range:1000"]
    assert os.path.exists(os.path.join(out_dir, "part=0", "_SUCCESS"))

    # resume: everything already complete -> nothing rewritten
    r2 = cp.checkpointed_write(rd.range(1000), out_dir, partition_fn, "v1")
    assert r2["written"] == []
    assert sorted(r2["skipped"]) == ["0", "1", "2", "3"]

    # full readback
    table = cp.read_output(out_dir)
    assert table.num_rows == 1000
    assert sorted(table["id"].to_pylist()) == list(range(1000))


def test_checkpoint_partial_failure_resume(ray_session, tmp_path):
    """A partition missing _SUCCESS (simulated crash) is redone; the
    others are skipped."""
    import shutil

    import ray.data as rd

    from geografir_ray.state import checkpoint as cp

    out_dir = str(tmp_path / "out")

    def partition_fn(t: pa.Table):
        k = t["id"].to_numpy()
        return {str(p): t.filter(pa.array(k % 3 == p)) for p in np.unique(k % 3)}

    cp.checkpointed_write(rd.range(300), out_dir, partition_fn, "v1")
    # simulate a crashed partition: remove its _SUCCESS
    os.remove(os.path.join(out_dir, "part=1", "_SUCCESS"))
    r = cp.checkpointed_write(rd.range(300), out_dir, partition_fn, "v1")
    assert r["written"] == ["1"]
    assert sorted(r["skipped"]) == ["0", "2"]
    assert cp.read_output(out_dir).num_rows == 300


def test_checkpoint_op_version_invalidates(ray_session, tmp_path):
    """Changed kernel version forces rewrite (SURVEY.md §7.4.6)."""
    import ray.data as rd

    from geografir_ray.state import checkpoint as cp

    out_dir = str(tmp_path / "out")

    def partition_fn(t: pa.Table):
        k = t["id"].to_numpy()
        return {str(p): t.filter(pa.array(k % 2 == p)) for p in np.unique(k % 2)}

    cp.checkpointed_write(rd.range(100), out_dir, partition_fn, "v1")
    r = cp.checkpointed_write(rd.range(100), out_dir, partition_fn, "v2")
    assert sorted(r["written"]) == ["0", "1"]  # all invalidated
    assert r["skipped"] == []


def test_export_documents_shards_matches_manifest(ray_session, tmp_path, sf_small):
    import pyarrow.parquet as pq

    from geografir_ray.pipelines.documents import (
        docs_shard_manifest,
        export_documents_shards,
    )
    from geografir_ray.state import checkpoint as cp

    out_dir = str(tmp_path / "shards")
    r1 = export_documents_shards(sf_small, out_dir)
    manifest = docs_shard_manifest(sf_small).to_pandas().set_index("shard")
    assert len(r1["written"]) == len(manifest)

    total = 0
    for _, row in manifest.iterrows():
        shard_key = f"shard={int(row.name):04d}"
        t = pq.read_table(f"{out_dir}/part={shard_key}/data.parquet")
        assert t.num_rows == row["n_docs"]
        total += t.num_rows
    src = pq.read_table(f"{sf_small}/documents.parquet")
    assert total == src.num_rows

    # resume: everything already written -> all skipped, nothing rewritten
    r2 = export_documents_shards(sf_small, out_dir)
    assert r2["written"] == []
    assert sorted(r2["skipped"]) == sorted(r1["written"])
