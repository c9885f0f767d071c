import pytest

from caesar_tpu.evalkit.dataset import ProblemDataset, resolve_dataset


def test_level1_resolves():
    ds = resolve_dataset("kernelbench-tpu/level1")
    assert len(ds) >= 10
    assert 23 in ds.get_problem_ids()
    assert ds.get_problem_path_by_id(23).endswith("23_Softmax.py")


def test_subset_is_first_ten():
    full = resolve_dataset("kernelbench-tpu/level1")
    sub = resolve_dataset("kernelbench-tpu/level1-subset")
    assert len(sub) == 10
    assert sub.get_problem_ids() == full.get_problem_ids()[:10]


def test_random_subset_is_seeded_and_stable():
    a = resolve_dataset("kernelbench-tpu/level1-random")
    b = resolve_dataset("kernelbench-tpu/level1-random")
    assert a.get_problem_ids() == b.get_problem_ids()
    assert len(a) == 10


def test_test_variant_is_softmax_only():
    ds = resolve_dataset("kernelbench-tpu/level1-test")
    assert ds.get_problem_ids() == [23]


def test_levels_2_and_3_exist():
    assert len(resolve_dataset("kernelbench-tpu/level2")) >= 5
    assert len(resolve_dataset("kernelbench-tpu/level3")) >= 3


def test_unknown_dataset_rejected():
    with pytest.raises(KeyError):
        resolve_dataset("kernelbench-tpu/level9")
    with pytest.raises(KeyError):
        resolve_dataset("bogus")


def test_bad_problem_filename_rejected(tmp_path):
    (tmp_path / "notaproblem.py").write_text("x = 1")
    with pytest.raises(ValueError):
        ProblemDataset([tmp_path / "notaproblem.py"])


def test_problem_files_parse_and_define_contract():
    import ast

    for name in ("level1", "level2", "level3"):
        ds = resolve_dataset(f"kernelbench-tpu/{name[:5]}{name[5]}")
        for pid in ds.get_problem_ids():
            src = open(ds.get_problem_path_by_id(pid)).read()
            tree = ast.parse(src)
            names = {
                n.name
                for n in ast.walk(tree)
                if isinstance(n, (ast.ClassDef, ast.FunctionDef))
            }
            assert "Model" in names, (name, pid)
            assert "get_inputs" in names, (name, pid)
            assert "get_init_inputs" in names, (name, pid)
