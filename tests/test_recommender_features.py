"""U9 golden parity: the recommender feature builder must reproduce the
reference's exact sparse layout (udfCrateFeatureVec,
FactorizationMachinesSample.scala:76-95) — offsets user /
MaxUserId+movie / MaxUserId+MaxMovieId+other, other-weight 1/(n-1)."""

import pytest

from examples.recommender import ratings_to_features

MAX_USER = 3    # users 1..2 -> max_user = 2 + 1
MAX_ITEM = 12   # items 10..11 -> max_item = 11 + 1


@pytest.fixture(scope="module")
def fmaps(spark):
    ratings = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, 0.7), (2, 10, 0.9)],
        "user int, item int, label double")
    out = ratings_to_features(ratings, MAX_USER, MAX_ITEM).collect()
    return {(r.user, r.item): (r.label, dict(r.fmap)) for r in out}


def test_one_hot_user_and_item_blocks(fmaps):
    label, m = fmaps[(2, 10)]
    # user 2 rated one item: exactly user one-hot + item one-hot, no
    # other-rated block (reference emits Map() when size < 2)
    assert label == 0.9
    assert m == {2: 1.0, MAX_USER + 10: 1.0}


def test_other_rated_block_offset_and_weight(fmaps):
    # user 1 rated items 10 and 11 -> n = 2, other weight 1/(2-1) = 1.0
    _, m10 = fmaps[(1, 10)]
    assert m10 == {1: 1.0,                       # user one-hot
                   MAX_USER + 10: 1.0,           # current item one-hot
                   MAX_USER + MAX_ITEM + 11: 1.0}  # other item, 1/(n-1)
    _, m11 = fmaps[(1, 11)]
    assert m11 == {1: 1.0, MAX_USER + 11: 1.0,
                   MAX_USER + MAX_ITEM + 10: 1.0}


def test_other_weight_splits_across_many(spark):
    # 4 rated items -> each of the 3 others weighted 1/3
    ratings = spark.createDataFrame(
        [(1, i, 1.0) for i in range(4)], "user int, item int, label double")
    out = ratings_to_features(ratings, 2, 4).collect()
    m = {r.item: dict(r.fmap) for r in out}[0]
    assert m[1] == 1.0 and m[2 + 0] == 1.0
    for other in (1, 2, 3):
        assert m[2 + 4 + other] == pytest.approx(1.0 / 3.0)
    # dimension bound: every index < max_user + 2*max_item
    for r in out:
        assert all(0 <= i < 2 + 2 * 4 for i in r.fmap)
