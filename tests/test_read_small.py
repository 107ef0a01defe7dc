"""read_small_pandas must be column- and filter-equivalent to the Ray
Dataset read it replaced on the broadcast-small dimension paths."""

import pyarrow.dataset as pads

from jsonld_js_ray.rayutil import read_small_pandas

SF = "/root/testdata/sf0.001"


def _canon(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_matches_ray_read_columns(ray_session):
    import ray.data as rd

    a = read_small_pandas(SF, "nation", ["n_nationkey", "n_name"])
    b = rd.read_parquet(f"{SF}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    assert _canon(a).equals(_canon(b))


def test_matches_ray_read_with_filter(ray_session):
    import ray.data as rd

    flt = pads.field("c_mktsegment") == "BUILDING"
    a = read_small_pandas(SF, "customer",
                          ["c_custkey", "c_mktsegment"], filter=flt)
    b = rd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"],
                        filter=flt).to_pandas()
    assert len(a) and _canon(a).equals(_canon(b))
    assert (a["c_mktsegment"] == "BUILDING").all()
