"""Hashed linear quality classifier: class separation on held-out
sentences, empty/None edges, determinism across instances, and the
bucket-hash dtype trap (uint64 % python-int promotes to float64)."""

import numpy as np

from data_quality_ray.stages.corpus import junk_sentences, make_caption, training_sentences
from data_quality_ray.stages.models import HashedLinearQuality


def test_separates_held_out():
    import random
    m = HashedLinearQuality()
    rng = random.Random(999)  # NOT the training seed
    good = [make_caption(rng) for _ in range(50)]
    bad = junk_sentences(n=50, seed=777)  # NOT the training seed
    out = m.score(np.array(good + bad, dtype=object))
    assert out["quality_label"][:50].mean() > 0.9
    assert out["quality_label"][50:].mean() < 0.1


def test_edges_and_determinism():
    m1, m2 = HashedLinearQuality(), HashedLinearQuality()
    np.testing.assert_array_equal(m1.w, m2.w)
    out = m1.score(np.array(["", None, "one"], dtype=object))
    assert out["n_features"].tolist() == [0, 0, 1]
    assert out["quality_score"][0] == 0.0 and not out["quality_label"][0]
    # label must agree with the ROUNDED score (the SQL contract)
    assert bool(out["quality_label"][2]) == (out["quality_score"][2] > 0)


def test_bucket_dtype_is_integer():
    m = HashedLinearQuality(n_buckets=64,
                            pos=training_sentences(n=20),
                            neg=junk_sentences(n=20))
    b = m._buckets(["alpha", "beta", "alpha beta"])
    assert b.dtype == np.int64 and (b >= 0).all() and (b < 64).all()
