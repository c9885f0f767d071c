from caesar_tpu.harness.codeblocks import extract_last_code


def test_extracts_last_python_block():
    resp = "first\n```python\na = 1\n```\ntext\n```python\nb = 2\n```\n"
    assert extract_last_code(resp) == "b = 2"


def test_untagged_block_accepted():
    resp = "```\nx = 3\n```"
    assert extract_last_code(resp) == "x = 3"


def test_rejected_language_skipped():
    resp = "```python\ngood\n```\n```rust\nbad\n```"
    assert extract_last_code(resp, ["python"]) == "good"


def test_no_block_returns_none():
    assert extract_last_code("no code here") is None
    assert extract_last_code("") is None
    assert extract_last_code(None) is None


def test_multiline_block_preserved():
    code = "import jax\n\n\nclass ModelNew:\n    pass"
    resp = f"Here you go:\n```python\n{code}\n```"
    assert extract_last_code(resp) == code


def test_cpp_tag_accepted_by_default():
    resp = "```cpp\nint main() {}\n```"
    assert extract_last_code(resp) == "int main() {}"
