"""Host-side data pipeline (numpy/cv2/PIL — never jitted).

Registry mirrors universal-image-restoration/data/__init__.py:36-62:
  mode 'MD'   — multi-degradation paired folders <root>/<type>/{GT,LQ}
  mode 'MDGT' — GT-only folders with on-the-fly random degradation
  mode 'LQGT' — paired LQ/GT folders
  mode 'LQ'   — unpaired LQ
  mode 'GT'   — GT with synthetic degradation by config
"""
from daclip_tpu.data.datasets import (GTDataset, LQDataset, LQGTDataset,
                                      MDDataset, MDGTDataset, create_dataset)
from daclip_tpu.data.loader import DataLoader, IterSampler


def create_dataloader(dataset, dataset_opt, opt=None, sampler=None):
    """data/__init__.py:8-33 parity: train → per-host batch (sharded over the
    data mesh axis by the caller), drop_last, shuffle unless a sampler is
    given; val/test → batch 1, no shuffle."""
    phase = dataset_opt.get("phase", "test")
    if phase == "train":
        num_hosts = (opt or {}).get("num_hosts", 1)
        batch_size = dataset_opt.get("batch_size", 1)
        if num_hosts > 1:
            assert batch_size % num_hosts == 0
            batch_size //= num_hosts
        return DataLoader(dataset, batch_size=batch_size,
                          sampler=sampler, shuffle=sampler is None,
                          num_workers=dataset_opt.get("n_workers", 0),
                          drop_last=True,
                          seed=dataset_opt.get("seed", 0) or 0)
    return DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False)


__all__ = ["MDDataset", "MDGTDataset", "LQGTDataset", "LQDataset", "GTDataset",
           "create_dataset", "create_dataloader", "DataLoader", "IterSampler"]
