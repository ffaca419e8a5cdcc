"""Data layer tests: packed format round-trip, COO->CSR, partitioning."""

import numpy as np

from legion_tpu.data.format import from_coo, load_dataset, save_dataset
from legion_tpu.data.partition import edge_cut_fraction, partition_graph


def test_format_roundtrip(small_graph, tmp_path):
    save_dataset(small_graph, str(tmp_path / "ds"))
    g = load_dataset(str(tmp_path / "ds"))
    np.testing.assert_array_equal(g.indptr, small_graph.indptr)
    np.testing.assert_array_equal(g.indices, small_graph.indices)
    np.testing.assert_allclose(g.features, small_graph.features)
    np.testing.assert_array_equal(g.train_ids, small_graph.train_ids)
    g.validate()


def test_from_coo_orientation():
    # edge (src=5, dst=2): 5's features flow into 2 => row 2 contains 5
    src = np.array([5, 4, 5], np.int32)
    dst = np.array([2, 2, 0], np.int32)
    g = from_coo(src, dst, 6, np.zeros((6, 2), np.float32),
                 np.zeros(6, np.int32), np.arange(6, dtype=np.int32),
                 np.array([], np.int32), np.array([], np.int32))
    assert g.indices[g.indptr[2]:g.indptr[3]].tolist() == [5, 4]
    assert g.indices[g.indptr[0]:g.indptr[1]].tolist() == [5]


def test_partition_modes(small_graph):
    for mode in ("hash", "greedy"):
        part = partition_graph(small_graph, 4, mode=mode)
        assert part.shape == (small_graph.num_nodes,)
        assert set(np.unique(part)) <= {0, 1, 2, 3}
        sizes = np.bincount(part, minlength=4)
        assert sizes.min() > 0.5 * small_graph.num_nodes / 4
    # greedy should cut fewer edges than hash on a clustered-ish graph
    cut_h = edge_cut_fraction(small_graph, partition_graph(small_graph, 4, "hash"))
    cut_g = edge_cut_fraction(small_graph, partition_graph(small_graph, 4, "greedy"))
    assert cut_g <= cut_h + 0.02
