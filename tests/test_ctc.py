"""CTC greedy decode semantics vs the reference's host loop
(rec_processor.rs:48-97): blank drop, adjacent-repeat collapse, mean-prob
score."""

import jax.numpy as jnp
import numpy as np
import pytest

from retto_tpu.ops.charset import CharacterDict, ascii_charset
from retto_tpu.ops.ctc import ctc_greedy_decode


def probs_from_indices(idx_rows, num_classes, peak=0.9):
    idx = np.asarray(idx_rows)
    n, t = idx.shape
    probs = np.full((n, t, num_classes), (1 - peak) / (num_classes - 1), np.float32)
    for i in range(n):
        for j in range(t):
            probs[i, j, idx[i, j]] = peak
    return jnp.asarray(probs)


def test_collapse_and_blank_drop():
    # dict: blank a b c ... ; sequence a a blank a b b -> "aab"
    chars = CharacterDict(["a", "b", "c"])
    probs = probs_from_indices([[1, 1, 0, 1, 2, 2]], chars.num_classes)
    idx, keep, score = ctc_greedy_decode(probs)
    texts = chars.decode_indices(np.asarray(idx), np.asarray(keep))
    assert texts == ["aab"]
    assert float(score[0]) == pytest.approx(0.9, abs=1e-6)


def test_no_remove_duplicate():
    chars = CharacterDict(["a", "b"])
    probs = probs_from_indices([[1, 1, 2]], chars.num_classes)
    idx, keep, _ = ctc_greedy_decode(probs, remove_duplicate=False)
    texts = chars.decode_indices(np.asarray(idx), np.asarray(keep))
    assert texts == ["aab"]


def test_all_blank_gives_empty_and_zero_score():
    chars = CharacterDict(["a"])
    probs = probs_from_indices([[0, 0, 0, 0]], chars.num_classes)
    idx, keep, score = ctc_greedy_decode(probs)
    assert chars.decode_indices(np.asarray(idx), np.asarray(keep)) == [""]
    assert float(score[0]) == 0.0


def test_batch_rows_independent():
    chars = CharacterDict(["a", "b", "c"])
    probs = probs_from_indices([[1, 2, 3], [3, 0, 3]], chars.num_classes)
    idx, keep, score = ctc_greedy_decode(probs)
    texts = chars.decode_indices(np.asarray(idx), np.asarray(keep))
    assert texts == ["abc", "cc"]


def test_valid_t_masks_pad_region():
    # a junk non-blank argmax deep in the padded tail ('how' -> 'howI'
    # tail mode) is dropped by valid_t; without valid_t it is kept
    chars = CharacterDict(["a", "b", "I"])
    rows = [[1, 2, 0, 0, 0, 0, 0, 3], [1, 2, 3, 0, 0, 0, 0, 0]]
    probs = probs_from_indices(rows, chars.num_classes)
    valid_t = jnp.asarray([3, 8], jnp.int32)  # row 0: steps >=3 are pad
    idx, keep, _ = ctc_greedy_decode(probs, valid_t=valid_t)
    assert chars.decode_indices(np.asarray(idx), np.asarray(keep)) == ["ab", "abI"]
    idx, keep, _ = ctc_greedy_decode(probs)
    assert chars.decode_indices(np.asarray(idx), np.asarray(keep)) == ["abI", "abI"]


def test_valid_t_affects_score():
    chars = CharacterDict(["a", "b"])
    probs = np.zeros((1, 4, 4), np.float32)
    probs[0, 0, 1] = 0.8  # 'a' kept
    probs[0, 3, 2] = 0.4  # 'b' in pad -> masked
    _, _, score = ctc_greedy_decode(jnp.asarray(probs), valid_t=jnp.asarray([2]))
    assert float(score[0]) == pytest.approx(0.8, abs=1e-6)


def test_score_is_mean_of_kept_probs():
    chars = CharacterDict(["a", "b"])
    probs = np.zeros((1, 3, 4), np.float32)
    probs[0, 0, 1] = 0.8  # 'a' kept
    probs[0, 1, 0] = 0.6  # blank dropped
    probs[0, 2, 2] = 0.4  # 'b' kept
    _, _, score = ctc_greedy_decode(jnp.asarray(probs))
    assert float(score[0]) == pytest.approx((0.8 + 0.4) / 2, abs=1e-6)


class TestCharset:
    def test_special_chars_inserted(self):
        # rec_processor.rs:39-41: "blank" prepended, " " appended
        d = CharacterDict(["x", "y"])
        assert d.chars[0] == "blank"
        assert d.chars[-1] == " "
        assert d.num_classes == 4

    def test_from_file(self, tmp_path):
        p = tmp_path / "keys.txt"
        p.write_text("a\nb\nc\n", encoding="utf-8")
        d = CharacterDict.from_file(p)
        assert d.chars == ["blank", "a", "b", "c", " "]

    def test_missing_file_raises(self):
        from retto_tpu.errors import ModelNotFoundError

        with pytest.raises(ModelNotFoundError):
            CharacterDict.from_file("/nonexistent/keys.txt")

    def test_encode_roundtrip(self):
        d = CharacterDict(ascii_charset())
        ids = d.encode("Hello world")
        assert len(ids) == 11  # space is in the dict (appended)
        decoded = "".join(d.chars[i] for i in ids)
        assert decoded == "Hello world"

    def test_ascii_charset_size(self):
        # 94 printable + blank + space = 96 classes
        assert CharacterDict(ascii_charset()).num_classes == 96
