"""Engine-emitted Arrow blocks must carry hashable (metadata-free) schemas.

``pa.Table.from_pandas`` attaches ``b'pandas'`` schema metadata, and
``hash(schema)`` raises ``unhashable type: 'dict'`` on such schemas —
which silently defeats Ray Data's ``unify_schemas`` set-based early-exit
and logs a "Failed to hash the schemas" warning per block pair.  Every
pandas→Arrow block the engine hands back to Ray Data goes through
``common.pd_to_arrow``, which strips the metadata; these tests pin the
helper's contract and spot-check a grouped_map output end-to-end.
"""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from crn_meta_validate_ray.stages.common import grouped_map, pd_to_arrow


def test_from_pandas_metadata_is_unhashable():
    # the premise: if pyarrow ever makes these schemas hashable the
    # helper becomes optional and this module can be retired
    t = pa.Table.from_pandas(pd.DataFrame({"a": [1]}), preserve_index=False)
    assert t.schema.metadata is not None
    with pytest.raises(TypeError):
        hash(t.schema)


def test_pd_to_arrow_strips_metadata_and_is_hashable():
    t = pd_to_arrow(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    assert t.schema.metadata is None
    hash(t.schema)  # must not raise
    assert t.to_pydict() == {"a": [1, 2], "b": ["x", "y"]}


def test_pd_to_arrow_schema_pin_still_strips():
    schema = pa.schema([("a", pa.int32())]).with_metadata({b"k": b"v"})
    t = pd_to_arrow(pd.DataFrame({"a": [7]}), schema=schema)
    assert t.schema.types == [pa.int32()]
    assert t.schema.metadata is None
    hash(t.schema)


def test_grouped_map_blocks_have_hashable_schemas(ray_session):
    ds = rd.from_arrow(pa.table({"k": [1, 1, 2, 2, 3], "v": [1, 2, 3, 4, 5]}))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", sort=False)["v"].sum().reset_index()

    out = grouped_map(ds, ["k"], agg, num_buckets=4)
    import ray
    for ref in out.to_arrow_refs():
        block = ray.get(ref)
        assert block.schema.metadata is None
        hash(block.schema)
