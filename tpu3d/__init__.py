"""tpu3d — TPU-native cross-domain 3D object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
cxy1997/3D_adapt_auto_driving (CVPR 2020, "Train in Germany, Test in The USA"):

- ``tpu3d.kitti``     — the KITTI data model (labels, calibration, boxes). Pure numpy.
- ``tpu3d.ops``       — point-cloud compute primitives (FPS, ball query, grouping,
                        three-NN interpolation, rotated IoU, rotated NMS, ROI point
                        pooling) as jittable JAX/Pallas kernels with numpy references.
- ``tpu3d.models``    — PointRCNN: PointNet++ MSG backbone, bin-based RPN, canonical
                        RCNN refinement. Functional flax modules, fixed shapes.
- ``tpu3d.datasets``  — host-side input pipeline producing fixed-shape device batches.
- ``tpu3d.parallel``  — mesh/sharding utilities; pjit data-parallel train/eval steps.
- ``tpu3d.evaluate``  — standalone KITTI rotated-IoU AP evaluator (old/new metrics,
                        output-transformation ablations).
- ``tpu3d.stat_norm`` — statistical normalization (car-size stats + point/label rescale).
- ``tpu3d.convert`` / ``tpu3d.download`` / ``tpu3d.split`` — dataset acquisition and
                        conversion to KITTI interchange format.
- ``tpu3d.tools``     — train/eval/database CLIs.
- ``tpu3d.runtime``   — native (C) fast-path IO / host runtime pieces.
"""

__version__ = "0.1.0"
