"""torchmeta.utils.gradient_based shim.

``gradient_update_parameters`` reproduces torchmeta 1.7.0 exactly: one
differentiable SGD step on an OrderedDict of parameters, with
``create_graph=not first_order`` (the second-order path the reference's
MAML/FuMI inner loops depend on, maml.py:173-177, fumi.py:172-176).
"""

from collections import OrderedDict

import torch


def gradient_update_parameters(model, loss, params=None, step_size=0.5,
                               first_order=False):
    if params is None:
        params = OrderedDict(model.meta_named_parameters())

    grads = torch.autograd.grad(loss, params.values(),
                                create_graph=not first_order)

    updated_params = OrderedDict()
    if isinstance(step_size, (dict, OrderedDict)):
        for (name, param), grad in zip(params.items(), grads):
            updated_params[name] = param - step_size[name] * grad
    else:
        for (name, param), grad in zip(params.items(), grads):
            updated_params[name] = param - step_size * grad

    return updated_params
