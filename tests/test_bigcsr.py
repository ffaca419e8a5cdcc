""">2^31-edge host-CSR addressing seams (VERDICT r3 next #1, CI-sized):
every component that touches the host CSR must use int64 addressing
past edge 2^31. The indices file is a SPARSE 8.6GB memmap (only the
touched pages exist on disk), so the test runs in CI without
materializing a billion-edge array."""

import json
import os

import numpy as np
import pytest

from legion_tpu.data.format import load_dataset

E_FAR = 2 ** 31 + 512          # run placed beyond the int32 boundary
N = 1024
DEG = 16


@pytest.fixture(scope="module")
def big_csr(tmp_path_factory):
    """(indptr, indices-memmap): node 0's run at [0, 16), node N-1's run
    at [2^31+512, 2^31+528) — all other nodes degree 0."""
    d = tmp_path_factory.mktemp("bigcsr")
    indptr = np.zeros(N + 1, np.int64)
    indptr[1:] = DEG                      # node 0: [0, DEG)
    indptr[N] = E_FAR + DEG               # node N-1: [E_FAR, E_FAR+DEG)
    indptr[N - 1] = E_FAR
    total = E_FAR + DEG

    fp = str(d / "indices.bin")
    lo = (np.arange(DEG, dtype=np.int32) + 100)
    hi = (np.arange(DEG, dtype=np.int32) + 900)
    with open(fp, "wb") as f:
        lo.tofile(f)
        f.seek(E_FAR * 4)                 # sparse hole
        hi.tofile(f)
        f.truncate(total * 4)
    indices = np.memmap(fp, dtype=np.int32, mode="r", shape=(total,))
    assert os.stat(fp).st_blocks * 512 < 1 << 20, "file must stay sparse"
    return indptr, indices


def test_runtime_sampler_beyond_2_31(big_csr):
    """The threaded C++ host sampler must read runs past edge 2^31."""
    from legion_tpu import runtime
    indptr, indices = big_csr
    ids = np.array([0, N - 1, -1], np.int32)
    out = runtime.sample_neighbors(indptr, indices, ids, DEG, seed=3)
    assert set(out[0]) <= set(range(100, 100 + DEG))
    assert set(out[1]) <= set(range(900, 900 + DEG)), out[1]
    assert (out[2] == -1).all()


def test_numpy_cold_sampler_beyond_2_31(big_csr):
    from legion_tpu.cache.topo_cache import host_sample_cold
    indptr, indices = big_csr
    ids = np.array([N - 1, 0], np.int32)
    out = host_sample_cold(indptr, indices, ids, DEG,
                           np.random.default_rng(0))
    assert set(out[0]) <= set(range(900, 900 + DEG))
    assert set(out[1]) <= set(range(100, 100 + DEG))


def test_topo_cache_build_beyond_2_31(big_csr):
    """TopoCache.build gathers hot adjacency across the int32 boundary
    (sub-CSR itself stays int32 — asserted there)."""
    from legion_tpu.cache.topo_cache import TopoCache
    indptr, indices = big_csr
    hot = np.array([N - 1, 0], np.int32)
    topo = TopoCache.build(indptr, indices, hot, capacity=2)
    sub = np.asarray(topo.sub_indices)
    assert set(sub[:DEG]) == set(range(100, 100 + DEG))
    assert set(sub[DEG:]) == set(range(900, 900 + DEG))


def test_striped_topo_build_beyond_2_31(big_csr):
    """StripedTopoCache stripes hot runs read from past 2^31."""
    import jax
    from jax.sharding import Mesh
    from legion_tpu.cache.striped import StripedTopoCache
    indptr, indices = big_csr
    mesh = Mesh(np.array(jax.devices()[:2]), ("cache",))
    hot = np.array([0, N - 1], np.int32)
    st = StripedTopoCache.build(indptr, indices, hot, capacity=2, mesh=mesh)
    si = np.asarray(st.sub_indices)
    # rank 0 (id 0) on stripe 0, rank 1 (id N-1) on stripe 1
    assert set(si[0][:DEG]) == set(range(100, 100 + DEG))
    assert set(si[1][:DEG]) == set(range(900, 900 + DEG))


def test_presample_hotness_beyond_2_31(big_csr):
    from legion_tpu.train.hybrid_driver import presample_hotness_host
    indptr, indices = big_csr
    seeds = np.full((1, 4), -1, np.int32)
    seeds[0, :2] = (0, N - 1)
    node_hot, edge_hot, mx = presample_hotness_host(
        indptr, indices, seeds, (4,), N, seed=0)
    assert edge_hot[0] == 1 and edge_hot[N - 1] == 1
    # the far run's neighbors were actually reached
    assert node_hot[900:900 + DEG].sum() > 0


def test_streaming_generator_roundtrip(tmp_path):
    """The uk-scale generator's output loads, validates, and shows the
    Zipf source skew the cache exists for (small-scale CI twin of
    tools/smoke_uk_scale.py's generation)."""
    from legion_tpu.data.synthetic import streaming_power_law_graph
    p = streaming_power_law_graph(
        str(tmp_path / "ds"), num_nodes=5000, avg_degree=7,
        feature_dim=8, num_classes=5, train_num=300, valid_num=50,
        test_num=50, chunk_nodes=1024, log=lambda s: None)
    g = load_dataset(p)
    g.validate()
    assert g.num_nodes == 5000
    meta = json.load(open(os.path.join(p, "meta.json")))
    assert meta["num_edges"] == g.num_edges
    deg = g.degrees()
    assert 5 < deg.mean() < 9
    counts = np.bincount(np.asarray(g.indices), minlength=5000)
    top = np.sort(counts)[::-1]
    assert top[:50].sum() > 3 * g.num_edges / 100, "expected Zipf skew"
    assert len(np.intersect1d(g.train_ids, g.valid_ids)) == 0
