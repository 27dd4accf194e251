"""Vendored genuine de-en corpus (training/deen_fixture.py).

The fixture replaces the saturating synthetic corpus for MT validation
(VERDICT r1 item 7): real parallel text, deterministic splits, no leakage
of exact pairs between train and validation."""

from flashattn_tpu.training.deen_fixture import (
    HAND_PAIRS, _expand_templates, make_fixture_dataset)
from flashattn_tpu.training.translation import get_dataset


def test_fixture_shape_and_determinism():
    ds = make_fixture_dataset(0)
    assert len(ds) >= 1000
    assert all(set(ex) == {"de", "en"} for ex in ds)
    # deterministic across calls (splits depend on it)
    assert ds == make_fixture_dataset(0)
    assert ds != make_fixture_dataset(1)  # but seed-sensitive shuffle


def test_fixture_no_duplicate_sources():
    ds = make_fixture_dataset(0)
    srcs = [ex["de"] for ex in ds]
    assert len(srcs) == len(set(srcs))


def test_fixture_is_genuine_text():
    # every pair is non-trivial natural language: multiple words, lowercase
    # tokenised style matching the reference's preprocessed IWSLT format
    for de, en in HAND_PAIRS + _expand_templates():
        assert len(de.split()) >= 3 and len(en.split()) >= 3
        assert de == de.lower() and en == en.lower()
        assert de.split()[-1] in {".", "?", "!"}


def test_get_dataset_fixture_splits():
    ds, src_key, tgt_key = get_dataset("deen-fixture", model_max_length=40)
    assert (src_key, tgt_key) == ("de", "en")
    assert set(ds) == {"train", "validation", "test"}
    train_srcs = {ex["de"] for ex in ds["train"]}
    val_srcs = {ex["de"] for ex in ds["validation"]}
    assert not (train_srcs & val_srcs), "train/val leakage"
    assert len(ds["validation"]) >= 50 and len(ds["test"]) >= 50
    assert len(ds["train"]) > 8 * len(ds["validation"]) * 0.8
