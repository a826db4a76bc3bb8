from simhand_tpu.core.joints import JointMap, JOINT_NAMES, PARENT_JOINT, CHILD_JOINT
from simhand_tpu.core import geometry
