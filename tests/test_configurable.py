"""Configurable contract tests, mirroring the reference's doctest suite
(`/root/reference/padertorch/configurable.py` docstrings and
`tests/test_configurable.py`)."""
import dataclasses
import json

import pytest

from padertorch_tpu.configurable import (
    Configurable,
    ConfigError,
    class_to_str,
    import_class,
    config_to_instance,
    recursive_class_to_str,
    dataclass_to_config,
)


class DenseLayer(Configurable):
    def __init__(self, in_units, out_units=3):
        self.in_units = in_units
        self.out_units = out_units


class Linearish(Configurable):
    def __init__(self, in_features, out_features, bias=True):
        self.in_features = in_features
        self.out_features = out_features
        self.bias = bias


class Bilinearish(Configurable):
    def __init__(self, in1_features, in2_features, out_features, bias=True):
        self.in1_features = in1_features
        self.in2_features = in2_features
        self.out_features = out_features
        self.bias = bias


class Relu(Configurable):
    def __init__(self, inplace=False):
        self.inplace = inplace


class CustomizableDenseLayer(Configurable):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['linear'] = {
            'factory': Linearish,
            'out_features': 3,
        }
        if config['linear']['factory'] == Linearish:
            config['linear']['in_features'] = 5
        config['activation'] = {'factory': Relu}

    def __init__(self, linear, activation):
        self.l = linear
        self.a = activation


class EncoderDecoder(Configurable):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['encoder'] = {
            'factory': DenseLayer,
            'in_units': config['in_features'],
            'out_units': 3,
        }
        config['decoder'] = {
            'factory': DenseLayer,
            'in_units': config['encoder']['out_units'],
            'out_units': 20,
        }

    def __init__(self, encoder, decoder, in_features=5):
        self.encoder = encoder
        self.decoder = decoder
        self.in_features = in_features


def test_get_config_signature_defaults():
    cfg = DenseLayer.get_config({'in_units': 5})
    assert cfg == {
        'factory': class_to_str(DenseLayer),
        'in_units': 5,
        'out_units': 3,
    }
    cfg = DenseLayer.get_config({'in_units': 5, 'out_units': 10})
    assert cfg['out_units'] == 10


def test_from_config_roundtrip():
    cfg = DenseLayer.get_config({'in_units': 5})
    layer = DenseLayer.from_config(cfg)
    assert isinstance(layer, DenseLayer)
    assert layer.in_units == 5 and layer.out_units == 3
    assert layer.config == recursive_class_to_str(cfg)


def test_new():
    layer = DenseLayer.new({'in_units': 4})
    assert layer.in_units == 4


def test_finalize_dogmatic_nested_defaults():
    cfg = CustomizableDenseLayer.get_config()
    assert cfg == {
        'factory': class_to_str(CustomizableDenseLayer),
        'linear': {
            'factory': class_to_str(Linearish),
            'in_features': 5,
            'out_features': 3,
            'bias': True,
        },
        'activation': {
            'factory': class_to_str(Relu),
            'inplace': False,
        },
    }
    instance = CustomizableDenseLayer.from_config(cfg)
    assert isinstance(instance.l, Linearish)
    assert isinstance(instance.a, Relu)


def test_dogmatic_update_priority_factory_swap():
    """Updates outrank finalize assignments; stale conditional kwargs drop."""
    cfg = CustomizableDenseLayer.get_config(updates={'linear': {
        'factory': Bilinearish,
        'in1_features': 10,
        'in2_features': 15,
    }})
    assert cfg['linear'] == {
        'factory': class_to_str(Bilinearish),
        'in1_features': 10,
        'in2_features': 15,
        'out_features': 3,   # unconditionally assigned in finalize
        'bias': True,        # Bilinearish signature default
    }
    assert 'in_features' not in cfg['linear']  # conditional branch not taken
    instance = CustomizableDenseLayer.from_config(cfg)
    assert isinstance(instance.l, Bilinearish)


def test_dogmatic_scalar_update_wins():
    class M(Configurable):
        @classmethod
        def finalize_dogmatic_config(cls, config):
            config['activation'] = 'relu'

        def __init__(self, activation='elu'):
            self.activation = activation

    assert M.get_config()['activation'] == 'relu'
    assert M.get_config({'activation': 'sigmoid'})['activation'] == 'sigmoid'


def test_dependent_config_entries():
    cfg = EncoderDecoder.get_config()
    assert cfg['encoder']['in_units'] == 5
    assert cfg['decoder']['in_units'] == 3
    # update propagates through the dependency written in finalize
    cfg = EncoderDecoder.get_config(updates={'encoder': {'out_units': 7}})
    assert cfg['encoder']['out_units'] == 7
    assert cfg['decoder']['in_units'] == 7
    # parent signature default feeding a child
    cfg = EncoderDecoder.get_config(updates={'in_features': 11})
    assert cfg['encoder']['in_units'] == 11


def test_partial_key():
    class SB(Configurable):
        @classmethod
        def finalize_dogmatic_config(cls, config):
            config['activation'] = {'partial': Relu}
            config['linear_2'] = {'partial': Linearish, 'in_features': 3}

        def __init__(self, linear_2, activation):
            self.l2 = linear_2(out_features=10)
            self.a = activation()

    cfg = SB.get_config()
    assert cfg['activation'] == {
        'partial': class_to_str(Relu), 'inplace': False}
    # required params without defaults omitted from partial configs
    assert cfg['linear_2'] == {
        'partial': class_to_str(Linearish), 'in_features': 3, 'bias': True}
    instance = SB.from_config(cfg)
    assert isinstance(instance.l2, Linearish)
    assert instance.l2.out_features == 10
    assert isinstance(instance.a, Relu)


def test_test_config_typo_suggestion():
    with pytest.raises(ConfigError) as excinfo:
        DenseLayer.get_config({'in_units': 5, 'out_unitz': 3})
    assert 'out_units' in str(excinfo.value)


def test_json_serializable():
    cfg = CustomizableDenseLayer.get_config()
    json.dumps(cfg)  # factories already strings


def test_import_class_roundtrip():
    assert import_class(class_to_str(DenseLayer)) is DenseLayer
    assert import_class('dict') is dict
    assert import_class(dict) is dict
    with pytest.raises(ImportError):
        import_class('padertorch_tpu.base.DoesNotExist')


def test_updates_mutated_in_place():
    """Sacred-style: the caller's updates dict receives the full config."""
    updates = {'in_units': 5}
    cfg = DenseLayer.get_config(updates)
    assert updates == cfg


def test_factory_in_updates_overrides_cls():
    cfg = Configurable.get_config({
        'factory': DenseLayer, 'in_units': 2})
    assert cfg['factory'] == class_to_str(DenseLayer)
    assert cfg['out_units'] == 3


def test_dataclass_to_config():
    @dataclasses.dataclass
    class Opts:
        lr: float = 0.1
        name: str = 'x'

    cfg = dataclass_to_config(Opts())
    assert cfg['lr'] == 0.1 and cfg['name'] == 'x'
    obj = config_to_instance(recursive_class_to_str(cfg))
    assert obj == Opts()


def test_from_file(tmp_path):
    from padertorch_tpu.io import dump_config
    cfg = {'trainer': {'model': DenseLayer.get_config({'in_units': 5})}}
    path = tmp_path / 'config.json'
    dump_config(cfg, path)
    model = DenseLayer.from_file(path, in_config_path='trainer.model')
    assert isinstance(model, DenseLayer)
    assert model.in_units == 5


def test_nested_list_of_factories():
    class Seq(Configurable):
        def __init__(self, layers):
            self.layers = layers

    cfg = Seq.get_config({'layers': [
        {'factory': Relu},
        {'factory': Linearish, 'in_features': 2, 'out_features': 2},
    ]})
    instance = Seq.from_config(cfg)
    assert isinstance(instance.layers[0], Relu)
    assert isinstance(instance.layers[1], Linearish)
