import textwrap

from lmsfc_tpu.config import Config, load_config


def test_attribute_and_dot_access():
    c = Config({"a": {"b": 1}, "s": "x"})
    assert c.a.b == 1
    assert c.select("a.b") == 1
    assert c.select("a.missing", 42) == 42


def test_interpolation():
    c = Config({"paths": {"root": "/out"}, "codec": {"dir": "${paths.root}/vtm"}})
    assert c.codec.dir == "/out/vtm"


def test_whole_value_interpolation_keeps_type():
    c = Config({"a": 7, "b": "${a}"})
    assert c.b == 7


def test_overrides_and_includes(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""\
        misc:
          seed: 0
        codec:
          type: bypass
    """))
    main = tmp_path / "main.yaml"
    main.write_text(textwrap.dedent("""\
        includes: [base.yaml]
        codec:
          type: lmsfc
    """))
    cfg = load_config(main, overrides=["misc.seed=3", "++codec.settings.qp=42"])
    assert cfg.misc.seed == 3
    assert cfg.codec.type == "lmsfc"
    assert cfg.codec.settings.qp == 42


def test_merge_deep():
    a = Config({"x": {"y": 1, "z": 2}})
    a.merge({"x": {"z": 3}})
    assert a.x.y == 1 and a.x.z == 3
