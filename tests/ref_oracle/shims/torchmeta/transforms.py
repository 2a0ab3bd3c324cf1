"""torchmeta.transforms shim: Categorical + ClassSplitter.

``ClassSplitter(dataset, shuffle=True, num_train_per_class=K,
num_test_per_class=Q)`` mirrors torchmeta 1.7.0's call-with-a-dataset
form: it attaches a splitter as the dataset's ``dataset_transform`` and
returns the dataset (the reference then calls ``.seed(0)`` on it,
data.py:146-184). Per task, each class's samples are split by a seeded
permutation into K support + Q query, raising ValueError when a class
has fewer than K+Q samples (torchmeta's fail-loud behavior — the device
sampler in fumi_tpu reproduces it as ``validate_episode``).

``Categorical(num_classes)`` is accepted for API parity; the 0..N-1
remap itself is applied structurally (class position in the combination
— see utils/data.py docstring for why this is exactly torchmeta's
order-of-first-appearance semantics under class-major layout).
"""

import numpy as np


class Categorical(object):
    def __init__(self, num_classes=None):
        self.num_classes = num_classes


class _Splitter(object):
    def __init__(self, shuffle, num_train_per_class, num_test_per_class):
        self.shuffle = shuffle
        self.num_train_per_class = num_train_per_class
        self.num_test_per_class = num_test_per_class
        self.np_random = np.random.RandomState()

    def seed(self, seed=None):
        self.np_random = np.random.RandomState(seed)

    def __call__(self, class_datasets):
        num_train = self.num_train_per_class
        num_test = self.num_test_per_class
        task = {"train": [], "test": []}
        for position, ds in enumerate(class_datasets):
            num_samples = len(ds)
            if num_samples < num_train + num_test:
                raise ValueError(
                    f"The number of samples for one class ({num_samples}) "
                    f"is smaller than the split ({num_train}+{num_test})")
            if self.shuffle:
                order = self.np_random.permutation(num_samples)
            else:
                order = np.arange(num_samples)
            for i in order[:num_train]:
                inputs, _ = ds[int(i)]
                task["train"].append((inputs, position))
            for i in order[num_train:num_train + num_test]:
                inputs, _ = ds[int(i)]
                task["test"].append((inputs, position))
        return task


def ClassSplitter(dataset=None, shuffle=True, num_train_per_class=None,
                  num_test_per_class=None):
    splitter = _Splitter(shuffle, num_train_per_class, num_test_per_class)
    if dataset is None:
        return splitter
    dataset.dataset_transform = splitter
    return dataset
