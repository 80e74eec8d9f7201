"""Unit tests for the lib layer (datatypes, saveload, timing) — mirrors the
reference's tests/svs/lib/ coverage style."""

import io
import os

import numpy as np
import pytest

from scalablevectorsearch_tpu.lib import datatypes as dt
from scalablevectorsearch_tpu.lib import saveload
from scalablevectorsearch_tpu.lib.timing import Timer


class TestDatatypes:
    def test_as_datatype(self):
        assert dt.as_datatype("float32") == dt.DataType.float32
        assert dt.as_datatype(np.float32) == dt.DataType.float32
        assert dt.as_datatype("bf16") == dt.DataType.bfloat16
        assert dt.as_datatype(np.int8) == dt.DataType.int8
        with pytest.raises(ValueError):
            dt.as_datatype("not_a_type")

    def test_padding(self):
        assert dt.padded_dim(128) == 128
        assert dt.padded_dim(129) == 256
        assert dt.padded_dim(1) == 128
        assert dt.padded_count(7, np.float32) == 8
        assert dt.padded_count(8, np.float32) == 8
        assert dt.padded_count(9, np.int8) == 32
        assert dt.pad_to(0, 8) == 8

    def test_pad_matrix(self):
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        p = dt.pad_matrix(x)
        assert p.shape == (8, 128)
        np.testing.assert_array_equal(p[:3, :4], x)
        assert p[3:].sum() == 0 and p[:, 4:].sum() == 0


class _Saveable:
    SCHEMA = "test_object"
    VERSION = saveload.Version(1, 2, 3)

    def __init__(self, payload, scalar):
        self.payload = payload
        self.scalar = scalar

    def save(self, ctx):
        return saveload.save_table(self.SCHEMA, self.VERSION, {
            "blob": ctx.save_array(self.payload),
            "scalar": self.scalar,
        })

    @classmethod
    def load(cls, table, ctx):
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        return cls(ctx.load_array(table["blob"]), table["scalar"])


class TestSaveLoad:
    def test_roundtrip(self, tmp_path):
        obj = _Saveable(np.arange(10.0), 42)
        saveload.save_to_disk(obj, str(tmp_path / "ckpt"))
        loaded = saveload.load_from_disk(_Saveable, str(tmp_path / "ckpt"))
        np.testing.assert_array_equal(loaded.payload, obj.payload)
        assert loaded.scalar == 42

    def test_schema_mismatch(self, tmp_path):
        obj = _Saveable(np.zeros(3), 1)
        saveload.save_to_disk(obj, str(tmp_path / "ckpt"))
        table = saveload.read_table(str(tmp_path / "ckpt"))
        with pytest.raises(saveload.SchemaMismatch):
            saveload.check_table(table, "other_schema", _Saveable.VERSION)
        with pytest.raises(saveload.SchemaMismatch):
            saveload.check_table(table, _Saveable.SCHEMA,
                                 saveload.Version(0, 0, 1))

    def test_version_parse(self):
        v = saveload.Version.parse("v1.2.3")
        assert (v.major, v.minor, v.patch) == (1, 2, 3)
        assert saveload.Version(0, 1, 0) < saveload.Version(1, 0, 0)
        assert str(v) == "v1.2.3"

    def test_try_load(self, tmp_path):
        ok, err = saveload.try_load_from_disk(_Saveable, str(tmp_path / "nope"))
        assert not ok

    def test_archive_roundtrip(self, tmp_path):
        src = tmp_path / "src"
        obj = _Saveable(np.arange(5.0), 7)
        saveload.save_to_disk(obj, str(src))
        buf = io.BytesIO()
        saveload.pack_directory(str(src), buf)
        buf.seek(0)
        dst = tmp_path / "dst"
        saveload.unpack_directory(buf, str(dst))
        loaded = saveload.load_from_disk(_Saveable, str(dst))
        assert loaded.scalar == 7
        assert sorted(os.listdir(src)) == sorted(os.listdir(dst))


class TestTimer:
    def test_nesting(self):
        t = Timer()
        with t.scope("outer"):
            with t.scope("inner"):
                pass
            with t.scope("inner"):
                pass
        rep = t.report()
        assert "outer" in rep and "inner" in rep
        assert t.root.children["outer"].children["inner"].calls == 2


class TestTransfer:
    def test_to_host_chunked_matches_asarray(self):
        import jax.numpy as jnp
        from scalablevectorsearch_tpu.lib.transfer import to_host_chunked
        a = jnp.arange(1000 * 7, dtype=jnp.int32).reshape(1000, 7)
        np.testing.assert_array_equal(to_host_chunked(a, row_chunk=128),
                                      np.asarray(a))
        # single-chunk fast path
        np.testing.assert_array_equal(to_host_chunked(a, row_chunk=4096),
                                      np.asarray(a))
        # non-divisible tail + 1-D
        b = jnp.arange(999, dtype=jnp.float32)
        np.testing.assert_array_equal(to_host_chunked(b, row_chunk=100),
                                      np.asarray(b))
