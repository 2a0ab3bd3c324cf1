"""torchmeta.modules shim: functional forward with explicit params.

Reproduces torchmeta 1.7.0 semantics for the three symbols the reference
uses (maml.py:8, fumi.py:5):

- ``MetaModule``: nn.Module whose submodule tree can be forwarded with an
  explicit OrderedDict of parameters; ``meta_named_parameters`` yields the
  named parameters owned by MetaModule instances; ``get_subdict`` slices a
  params dict by submodule prefix.
- ``MetaLinear``: nn.Linear accepting ``params={'weight','bias'}``.
- ``MetaSequential``: nn.Sequential routing ``params`` sub-dicts to
  MetaModule children and calling plain modules (ReLU/Dropout) directly.
"""

from collections import OrderedDict

import torch.nn as nn
import torch.nn.functional as F


class MetaModule(nn.Module):
    def meta_named_parameters(self, prefix="", recurse=True):
        gen = self._named_members(
            lambda module: module._parameters.items()
            if isinstance(module, MetaModule) else [],
            prefix=prefix, recurse=recurse)
        yield from gen

    def meta_parameters(self, recurse=True):
        for _, param in self.meta_named_parameters(recurse=recurse):
            yield param

    def get_subdict(self, params, key=None):
        if params is None:
            return None
        all_names = tuple(params.keys())
        if key is None:
            return params
        key_escape = key + "."
        return OrderedDict(
            (name[len(key_escape):], params[name])
            for name in all_names if name.startswith(key_escape))


class MetaLinear(nn.Linear, MetaModule):
    def forward(self, input, params=None):
        if params is None:
            params = OrderedDict(self.named_parameters())
        bias = params.get("bias", None)
        return F.linear(input, params["weight"], bias)


class MetaSequential(nn.Sequential, MetaModule):
    def forward(self, input, params=None):
        for name, module in self._modules.items():
            if isinstance(module, MetaModule):
                input = module(input, params=self.get_subdict(params, name))
            elif isinstance(module, nn.Module):
                input = module(input)
            else:
                raise TypeError(f"unsupported module type {type(module)}")
        return input
