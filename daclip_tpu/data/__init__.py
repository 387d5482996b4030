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

__all__ = ["MDDataset", "MDGTDataset", "LQGTDataset", "LQDataset", "GTDataset",
           "create_dataset", "DataLoader", "IterSampler"]
