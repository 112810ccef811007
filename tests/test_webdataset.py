"""Round-trip and adversarial tests for the WebDataset sharded-tar
source (sources/webdataset.py, round 12). Ground truth is the fixture
SPEC fed to build_tar — expectations are reconstructed from the
sample dicts, never by re-parsing (the test_warc convention)."""

from __future__ import annotations

import random

import pytest

from data_ingestor_gluejob_script_spark.sources.webdataset import (
    build_tar,
    iter_tar_members,
    read_webdataset,
    read_webdataset_samples,
    split_member_name,
)


def _fixture_samples():
    return [
        {
            "key": "train/0000",
            "members": {
                "jpg": b"\xff\xd8\xff fake jpeg bytes \x00\x01",
                "json": b'{"caption": "a cat"}',
                "txt": b"a cat",
            },
        },
        {
            "key": "train/0001",
            "members": {"jpg": b"" , "seg.png": b"mask\x00bytes"},
        },
        {"key": "train/0002", "members": {"txt": b"text only"}},
        # no-dot basename: whole name is the key, ext ''
        {"key": "METADATA", "members": {"": b"shard manifest"}},
    ]


def test_split_member_name():
    assert split_member_name("train/0001.jpg") == ("train/0001", "jpg")
    assert split_member_name("a/b/0001.seg.png") == ("a/b/0001", "seg.png")
    assert split_member_name("plain.txt") == ("plain", "txt")
    assert split_member_name("METADATA") == ("METADATA", "")
    assert split_member_name("d/METADATA") == ("d/METADATA", "")


@pytest.mark.parametrize("gz", [False, True])
def test_member_roundtrip(spark, tmp_path, gz):
    name = "s.tar.gz" if gz else "s.tar"
    (tmp_path / name).write_bytes(build_tar(_fixture_samples(), gz=gz))
    rows = read_webdataset(spark, str(tmp_path)).collect()
    got = {(r.key, r.ext): bytes(r.data) for r in rows}
    want = {
        (s["key"], ext): data
        for s in _fixture_samples()
        for ext, data in s["members"].items()
    }
    assert got == want
    assert all(r.shard.endswith(name) for r in rows)


@pytest.mark.parametrize("gz", [False, True])
def test_sample_grouping(spark, tmp_path, gz):
    name = "s.tar.gz" if gz else "s.tar"
    (tmp_path / name).write_bytes(build_tar(_fixture_samples(), gz=gz))
    rows = read_webdataset_samples(spark, str(tmp_path)).collect()
    got = {
        r.key: {e: bytes(v) for e, v in r.members.items()} for r in rows
    }
    assert got == {s["key"]: s["members"] for s in _fixture_samples()}


def test_extension_and_size_filters(spark, tmp_path):
    (tmp_path / "s.tar").write_bytes(build_tar(_fixture_samples()))
    only_jpg = read_webdataset(
        spark, str(tmp_path), extensions=("jpg",)
    ).collect()
    assert {r.key for r in only_jpg} == {"train/0000", "train/0001"}
    # empty filter keeps NOTHING (the read_warc types convention)
    assert read_webdataset(spark, str(tmp_path), extensions=()).count() == 0
    capped = read_webdataset(spark, str(tmp_path), max_member=5).collect()
    assert {(r.key, r.ext) for r in capped} == {
        ("train/0001", "jpg"),
        ("train/0000", "txt"),
    }
    # sample form: fully-filtered samples drop, partial ones shrink
    samp = read_webdataset_samples(
        spark, str(tmp_path), extensions=("jpg", "txt")
    ).collect()
    got = {r.key: set(r.members.keys()) for r in samp}
    assert got == {
        "train/0000": {"jpg", "txt"},
        "train/0001": {"jpg"},
        "train/0002": {"txt"},
    }


def test_multi_shard_and_random_bytes(spark, tmp_path):
    """Payloads stuffed with tar-lookalike bytes round-trip exactly
    across several shards (framing is header-driven, never content
    sniffing)."""
    rng = random.Random(42)
    shards = []
    for sh in range(3):
        samples = [
            {
                "key": f"s{sh}/{i:04d}",
                "members": {
                    "bin": bytes(
                        rng.randrange(256)
                        for _ in range(rng.randrange(0, 600))
                    ),
                    "cls": str(rng.randrange(10)).encode(),
                },
            }
            for i in range(25)
        ]
        shards.append(samples)
        (tmp_path / f"shard-{sh}.tar").write_bytes(build_tar(samples))
    rows = read_webdataset_samples(spark, str(tmp_path)).collect()
    got = {
        r.key: {e: bytes(v) for e, v in r.members.items()} for r in rows
    }
    want = {s["key"]: s["members"] for sh in shards for s in sh}
    assert got == want


def test_nonconsecutive_key_not_merged():
    """A key reappearing after a gap (out-of-spec shard) must become
    a SEPARATE sample, not silently merge across the gap — grouping
    rides contiguity only."""
    raw = build_tar(
        [
            {"key": "a", "members": {"x": b"1"}},
            {"key": "b", "members": {"x": b"2"}},
            {"key": "a", "members": {"y": b"3"}},
        ]
    )
    members = list(iter_tar_members("s.tar", raw))
    assert members == [("a", "x", b"1"), ("b", "x", b"2"), ("a", "y", b"3")]


def test_nonconsecutive_key_samples(spark, tmp_path):
    (tmp_path / "s.tar").write_bytes(
        build_tar(
            [
                {"key": "a", "members": {"x": b"1"}},
                {"key": "b", "members": {"x": b"2"}},
                {"key": "a", "members": {"y": b"3"}},
            ]
        )
    )
    rows = read_webdataset_samples(spark, str(tmp_path)).collect()
    got = sorted(
        (r.key, tuple(sorted(r.members.keys()))) for r in rows
    )
    assert got == [("a", ("x",)), ("a", ("y",)), ("b", ("x",))]


def test_flush_boundary_never_splits_sample(spark, tmp_path):
    """A shard crossing the 10k-row flush must come back complete —
    no sample lost, duplicated, or split at the chunk edge."""
    n = 5_050  # 2 members/sample -> crosses the 10k member-row flush
    samples = [
        {
            "key": f"k{i:05d}",
            "members": {"jpg": f"img{i}".encode(), "txt": f"t{i}".encode()},
        }
        for i in range(n)
    ]
    (tmp_path / "big.tar").write_bytes(build_tar(samples))
    flat = read_webdataset(spark, str(tmp_path)).collect()
    assert len(flat) == 2 * n
    samp = read_webdataset_samples(spark, str(tmp_path)).collect()
    assert len(samp) == n
    by_key = {
        r.key: {e: bytes(v) for e, v in r.members.items()} for r in samp
    }
    assert by_key[f"k{n - 1:05d}"] == samples[-1]["members"]
    assert all(len(m) == 2 for m in by_key.values())


def test_e2e_into_image_dedup_and_resize(spark, tmp_path):
    """The source feeds the multimodal operators directly: duplicate
    payloads across shards collapse in image_dedup_frame (identical
    bytes -> identical dHash -> one survivor), and resize_media
    returns the contracted shape."""
    from data_ingestor_gluejob_script_spark.operators.multimodal import (
        image_dedup_frame,
        resize_media,
    )

    rng = random.Random(7)
    img_a = bytes(rng.randrange(256) for _ in range(300))
    img_b = bytes(rng.randrange(256) for _ in range(300))
    (tmp_path / "s0.tar").write_bytes(
        build_tar(
            [
                {"key": "0", "members": {"jpg": img_a}},
                {"key": "1", "members": {"jpg": img_b}},
            ]
        )
    )
    (tmp_path / "s1.tar").write_bytes(
        build_tar([{"key": "2", "members": {"jpg": img_a}}])  # dup of 0
    )
    imgs = read_webdataset_samples(spark, str(tmp_path)).select(
        "key", "members"
    ).selectExpr("key as doc_id", "members['jpg'] as payload")
    kept = image_dedup_frame(imgs, id_col="doc_id").collect()
    assert {r.doc_id for r in kept} == {"0", "1"}
    sized = resize_media(imgs, width=4, height=4, id_col="doc_id").collect()
    assert len(sized) == 3
    assert all(len(bytes(r.payload)) == 16 for r in sized)


def test_hidden_members_are_dropped(spark, tmp_path):
    """r13 sources review: dot-leading basenames (macOS AppleDouble
    '._0001.jpg', '.hidden') must be DROPPED like the reference
    base_plus_ext regex does — previously a run of hidden files merged
    into one bogus sample keyed by the bare directory prefix."""
    import io
    import tarfile

    from data_ingestor_gluejob_script_spark.sources.webdataset import (
        iter_tar_members,
        split_member_name,
    )

    assert split_member_name("train/._0001.jpg") is None
    assert split_member_name(".hidden") is None
    assert split_member_name("train/0001.jpg") == ("train/0001", "jpg")

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("train/._0001.jpg", b"apple-double"),
            ("train/0001.jpg", b"img"),
            ("train/0001.json", b"{}"),
            ("train/._0002.jpg", b"apple-double"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = list(iter_tar_members("s.tar", buf.getvalue()))
    assert [(k, e) for k, e, _ in got] == [
        ("train/0001", "jpg"),
        ("train/0001", "json"),
    ]
