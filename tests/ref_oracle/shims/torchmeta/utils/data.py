"""torchmeta.utils.data shim: episodic dataset machinery.

Provides the four symbols the reference's data layer imports
(data.py:17-19). Semantics follow torchmeta 1.7.0:

- class-combination tasks are sampled uniformly via
  ``random.sample(range(num_classes), N)`` (torchmeta's
  CombinationRandomSampler uses the same call on the same global RNG,
  which the reference seeds in main.py:51-53),
- episodes are class-major (torchmeta ConcatTask concatenates the
  combination's per-class datasets in order),
- targets are remapped to the class's position in the combination
  (torchmeta Categorical assigns consecutive labels in order of first
  appearance, which under class-major layout IS the position),
- the support/query split is delegated to the dataset_transform
  (ClassSplitter — see transforms.py), which fails loudly on classes
  thinner than K+Q exactly like torchmeta's splitter.

Batches collate to the reference wire format
``{'train': (inputs_tuple, targets), 'test': ...}`` with every leaf
shaped ``(B, N*K_or_Q, ...)`` (SURVEY §2.4; data.py:632-643).
"""

import random

import torch
import torch.utils.data


class Dataset(torch.utils.data.Dataset):
    def __init__(self, index, transform=None, target_transform=None):
        self.index = index
        self.transform = transform
        self.target_transform = target_transform


class ClassDataset(object):
    def __init__(self, meta_train=False, meta_val=False, meta_test=False,
                 meta_split=None, class_augmentations=None):
        self.meta_train = meta_train
        self.meta_val = meta_val
        self.meta_test = meta_test

    def get_target_transform(self, index):
        # Per-class target transform: none. The Categorical remap is
        # applied at task level (position in the combination), matching
        # torchmeta's ConcatTask-level wrap_transform.
        return None


class CombinationMetaDataset(object):
    def __init__(self, dataset, num_classes_per_task, target_transform=None,
                 dataset_transform=None):
        self.dataset = dataset
        self.num_classes_per_task = num_classes_per_task
        self.target_transform = target_transform
        self.dataset_transform = dataset_transform

    def seed(self, seed=None):
        if self.dataset_transform is not None:
            self.dataset_transform.seed(seed)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, combination):
        class_datasets = []
        for class_idx in combination:
            ds = self.dataset[class_idx]
            # Accommodation for the reference's STANDARD tokenisation
            # mode: InatAnimClassDataset stores token-id descriptions as
            # python lists (data.py:467-469) but InatAnimDataset.
            # __getitem__ calls .clone().detach() on them (data.py:575)
            # — an AttributeError under real torchmeta too (the published
            # experiments ran the BERT path). Normalising the attribute
            # to a LongTensor lets the reference's own fetch path run
            # unmodified. Recorded in docs/PARITY.md.
            if isinstance(getattr(ds, "description", None), list):
                ds.description = torch.as_tensor(ds.description,
                                                 dtype=torch.long)
            class_datasets.append(ds)
        if self.dataset_transform is None:
            raise RuntimeError(
                "shim CombinationMetaDataset requires a ClassSplitter "
                "dataset_transform (the reference always wraps splits, "
                "data.py:146-184)")
        return self.dataset_transform(class_datasets)


def _collate_tasks(tasks):
    """Stack a list of per-task {'train': [(inputs, target)], 'test': ...}
    into the reference wire format."""
    batch = {}
    for split in ("train", "test"):
        n_leaves = len(tasks[0][split][0][0])
        leaves = []
        for li in range(n_leaves):
            leaves.append(torch.stack([
                torch.stack([torch.as_tensor(sample[0][li])
                             for sample in task[split]])
                for task in tasks]))
        targets = torch.stack([
            torch.as_tensor([sample[1] for sample in task[split]],
                            dtype=torch.int64)
            for task in tasks])
        batch[split] = [tuple(leaves), targets]
    return batch


class BatchMetaDataLoader(object):
    """Infinite iterator of collated meta-batches (torchmeta's loader is
    finite over C-choose-N combinations — effectively infinite; the
    reference's loops always break on a counter)."""

    def __init__(self, dataset, batch_size=1, shuffle=True, num_workers=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle

    def __iter__(self):
        num_classes = len(self.dataset)
        n_way = self.dataset.num_classes_per_task
        while True:
            tasks = []
            for _ in range(self.batch_size):
                combination = random.sample(range(num_classes), n_way)
                tasks.append(self.dataset[tuple(combination)])
            yield _collate_tasks(tasks)
