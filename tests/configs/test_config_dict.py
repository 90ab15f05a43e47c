"""ConfigDict behavior (model: reference tests/configs/test_configs.py)."""
import pickle

from basedet_tpu.utils import ConfigDict


def test_attribute_access_and_nesting():
    c = ConfigDict()
    c.MODEL = dict(NAME="RetinaNet", BACKBONE=dict(NAME="resnet50"))
    assert c.MODEL.BACKBONE.NAME == "resnet50"
    assert isinstance(c.MODEL, ConfigDict)


def test_merge_mapping_recursive():
    c = ConfigDict(MODEL=dict(NAME="a", HEAD=dict(N=4)))
    c.merge(dict(MODEL=dict(HEAD=dict(N=2), EXTRA=1)))
    assert c.MODEL.NAME == "a"
    assert c.MODEL.HEAD.N == 2
    assert c.MODEL.EXTRA == 1


def test_merge_opts_dotted():
    c = ConfigDict(SOLVER=dict(BASIC_LR=0.01))
    c.merge(["SOLVER.BASIC_LR", "0.02", "MODEL.NAME", "FCOS"])
    assert c.SOLVER.BASIC_LR == 0.02
    assert c.MODEL.NAME == "FCOS"


def test_diff():
    a = ConfigDict(X=1, SUB=dict(Y=2, Z=3))
    b = ConfigDict(X=1, SUB=dict(Y=2, Z=4))
    d = a.diff(b)
    assert d == {"SUB": {"Z": 3}}


def test_pickle_roundtrip():
    c = ConfigDict(MODEL=dict(NAME="x", LST=[1, 2, dict(a=3)]))
    c2 = pickle.loads(pickle.dumps(c))
    assert c2.MODEL.NAME == "x"
    assert c2.MODEL.LST[2].a == 3
    assert isinstance(c2.MODEL, ConfigDict)


def test_find():
    c = ConfigDict(MODEL=dict(BACKBONE=dict(NAME="r50")), SOLVER=dict(LR=0.1))
    found = c.find("backbone")
    assert found.MODEL.BACKBONE.NAME == "r50"
    assert "SOLVER" not in found


def test_clone_independent():
    c = ConfigDict(A=dict(B=1))
    c2 = c.clone()
    c2.A.B = 9
    assert c.A.B == 1
