"""TEMOS-style transform stack (rots/joints/features datastructs).

Rebuild of /root/reference/src/ladiff/transforms/: used by the action-to-
motion path and Temos metrics; the core HumanML3D path uses the 263-dim
codec in ladiff_tpu/data/humanml instead.
"""
from ladiff_tpu.transforms.base import (Datastruct, Transform,
                                        collate_tensor_with_padding)
from ladiff_tpu.transforms.joints2jfeats import Rifke
from ladiff_tpu.transforms.rots2joints import SMPLH
from ladiff_tpu.transforms.rots2rfeats import SMPLVelP
from ladiff_tpu.transforms.smpl import (RotIdentityTransform,
                                        RotTransDatastruct, SMPLDatastruct,
                                        SMPLTransform)

__all__ = [
    "Datastruct", "Transform", "collate_tensor_with_padding",
    "Rifke", "SMPLH", "SMPLVelP",
    "RotIdentityTransform", "RotTransDatastruct", "SMPLDatastruct",
    "SMPLTransform",
]
