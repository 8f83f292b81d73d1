"""Payload encryption for the KMS leg (S11 data path).

The reference encrypts payloads by delegating to the provider's SSE-KMS
(`uploadEncryptedFile`, impl/backup/Backuper.java:29-43; the S3 backuper
stamps the KMS key id into the object metadata). On a Hadoop-FS/local
bucket there is no provider to delegate to, so this module supplies the
data path itself with a pure-stdlib stream cipher:

    ciphertext = plaintext XOR keystream(data_key, nonce)
    keystream  = SHA256(data_key || nonce || counter_0) ||
                 SHA256(data_key || nonce || counter_1) || …

a textbook hash-based CTR construction (the same shape as HMAC-DRBG /
AES-CTR, with SHA-256 as the block source — public algorithm, no external
libraries). The per-object nonce is derived from the plaintext digest, so
encryption is DETERMINISTIC: re-uploading unchanged content produces
byte-identical objects and the content-addressed freshen/skip logic keeps
working. Nonce reuse across objects is safe here because equal nonce ⇒
equal plaintext ⇒ equal ciphertext (no keystream reuse across distinct
messages).

The data key is derived locally from ``kms_key_id`` — a stand-in for the
KMS GenerateDataKey call (the crypto boundary is the same fixture seam as
JMX/live-schema per SURVEY §2.7); swap ``_data_key`` for a real KMS client
on a cluster. Manifests are NEVER encrypted (UploadTracker.java:133-139).

On-disk format: b"ESOPENC1" || 16-byte nonce || ciphertext.
"""

from __future__ import annotations

import hashlib
import os
import shutil

MAGIC = b"ESOPENC1"
_CHUNK = 1 << 20


def _data_key(kms_key_id: str) -> bytes:
    """Local stand-in for KMS GenerateDataKey(kms_key_id)."""
    return hashlib.sha256(b"esop-kms-data-key:" + kms_key_id.encode()).digest()


def _xor_stream(data: bytes, key: bytes, nonce: bytes, counter0: int) -> tuple[bytes, int]:
    """XOR ``data`` with the SHA256-CTR keystream starting at block
    ``counter0``; returns (output, next counter). Block-aligned input only
    (callers chunk at multiples of 32 bytes except the final chunk)."""
    out = bytearray(len(data))
    ks = bytearray()
    counter = counter0
    while len(ks) < len(data):
        ks += hashlib.sha256(key + nonce + counter.to_bytes(8, "big")).digest()
        counter += 1
    for i in range(len(data)):
        out[i] = data[i] ^ ks[i]
    return bytes(out), counter


def encrypt_file(src: str, dst: str, kms_key_id: str) -> None:
    """Encrypt ``src`` → ``dst`` (header + nonce + ciphertext). Chunked —
    never holds more than ~1 MiB of payload in memory per task."""
    key = _data_key(kms_key_id)
    digest = hashlib.sha256()
    with open(src, "rb") as f:
        while chunk := f.read(_CHUNK):
            digest.update(chunk)
    nonce = digest.digest()[:16]
    counter = 0
    with open(src, "rb") as f, open(dst, "wb") as g:
        g.write(MAGIC)
        g.write(nonce)
        while chunk := f.read(_CHUNK):
            ct, counter = _xor_stream(chunk, key, nonce, counter)
            g.write(ct)


def is_encrypted(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(len(MAGIC)) == MAGIC


def decrypt_to(src: str, dst: str, kms_key_id: str | None) -> None:
    """Copy ``src`` → ``dst``, transparently decrypting when the object
    carries the encryption header. A header without a key is a hard error
    (restoring an encrypted backup without its --kmsKeyId)."""
    with open(src, "rb") as f:
        head = f.read(len(MAGIC))
        if head != MAGIC:
            shutil.copyfile(src, dst)
            return
        if kms_key_id is None:
            raise RuntimeError(
                f"{src} is encrypted but no kms_key_id is recorded in the "
                "manifest entry — cannot decrypt"
            )
        key = _data_key(kms_key_id)
        nonce = f.read(16)
        counter = 0
        with open(dst, "wb") as g:
            while chunk := f.read(_CHUNK):
                pt, counter = _xor_stream(chunk, key, nonce, counter)
                g.write(pt)


def roundtrip_bytes(data: bytes, kms_key_id: str) -> bytes:
    """Test helper: encrypt+decrypt in memory must be the identity."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        a, b, c = (os.path.join(d, n) for n in "abc")
        with open(a, "wb") as f:
            f.write(data)
        encrypt_file(a, b, kms_key_id)
        decrypt_to(b, c, kms_key_id)
        with open(c, "rb") as f:
            return f.read()
