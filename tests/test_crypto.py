"""Encryption data path (uploadEncryptedFile, Backuper.java:29-43): payload
bytes at rest must actually be encrypted when --kmsKeyId is set, manifests
stay plaintext, and a backup→restore round trip is the identity."""

import glob
import json
import os

from esop_spark.functions import crypto
from esop_spark.operators import pipelines
from tests.test_pipelines import BASE_FILES, make_tree


def test_roundtrip_identity_and_ciphertext_differs():
    data = b"some sstable payload bytes" * 1000 + b"tail"
    assert crypto.roundtrip_bytes(data, "k1") == data
    # tiny and empty payloads
    assert crypto.roundtrip_bytes(b"", "k1") == b""
    assert crypto.roundtrip_bytes(b"x", "k1") == b"x"


def test_encrypt_is_deterministic_and_key_sensitive(tmp_path):
    src = str(tmp_path / "f")
    with open(src, "wb") as f:
        f.write(b"payload" * 100)
    a, b, c = (str(tmp_path / n) for n in "abc")
    crypto.encrypt_file(src, a, "k1")
    crypto.encrypt_file(src, b, "k1")
    crypto.encrypt_file(src, c, "k2")
    assert open(a, "rb").read() == open(b, "rb").read()  # freshen-stable
    assert open(a, "rb").read() != open(c, "rb").read()
    assert crypto.is_encrypted(a)
    assert open(a, "rb").read()[24:] != b"payload" * 100


def test_encrypted_backup_restore_round_trip(spark, tmp_path):
    data, bucket, out = (str(tmp_path / n) for n in ("data", "bucket", "out"))
    make_tree(data, "snap1", BASE_FILES)
    pipelines.backup(
        spark, [data], "snap1", bucket, schema_version="sv", ts_millis=1000,
        kms_key_id="kms-key-7",
    )
    # every data object at rest is ciphertext…
    objs = [
        p
        for p in glob.glob(os.path.join(bucket, "data", "**"), recursive=True)
        if os.path.isfile(p)
    ]
    assert objs and all(crypto.is_encrypted(p) for p in objs)
    # …while manifests are readable plaintext JSON tagged with the key
    (mpath,) = glob.glob(os.path.join(bucket, "manifests", "*.json"))
    doc = json.load(open(mpath))
    entries = [
        e
        for ks in doc["snapshot"]["keyspaces"].values()
        for t in ks["tables"].values()
        for es in t["sstables"].values()
        for e in es
    ]
    assert entries and all(e["kmsKeyId"] == "kms-key-7" for e in entries)

    stats = pipelines.restore(spark, bucket, out)
    assert stats["downloaded"] == len(BASE_FILES)
    for (ks, table, comp), content in BASE_FILES.items():
        from tests.test_pipelines import TABLE_ID

        p = os.path.join(out, ks, f"{table}-{TABLE_ID}", comp)
        assert open(p).read() == content, p


def test_encrypted_restore_heals_corruption(spark, tmp_path):
    """The mismatch leg re-downloads AND re-decrypts a corrupted target."""
    data, bucket, out = (str(tmp_path / n) for n in ("data", "bucket", "out"))
    make_tree(data, "snap1", BASE_FILES)
    pipelines.backup(
        spark, [data], "snap1", bucket, schema_version="sv", ts_millis=1000,
        kms_key_id="kms-key-7",
    )
    pipelines.restore(spark, bucket, out)
    from tests.test_pipelines import TABLE_ID

    victim = os.path.join(out, "ks1", f"t1-{TABLE_ID}", "me-1-big-Data.db")
    with open(victim, "w") as f:
        f.write("corrupted!!")
    stats = pipelines.restore(spark, bucket, out)
    assert stats["downloaded"] == 1
    assert open(victim).read() == BASE_FILES[("ks1", "t1", "me-1-big-Data.db")]


def test_encrypted_object_without_key_is_hard_error(tmp_path):
    src, enc, dst = (str(tmp_path / n) for n in ("s", "e", "d"))
    with open(src, "wb") as f:
        f.write(b"data")
    crypto.encrypt_file(src, enc, "k")
    import pytest

    with pytest.raises(RuntimeError, match="encrypted but no kms_key_id"):
        crypto.decrypt_to(enc, dst, None)
