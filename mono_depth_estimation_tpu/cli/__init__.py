"""CLI drivers with the reference's public interface.

``python train.py [globals] <dataset> [ds args] <method> [method args]``
with the chained sub-command grammar of the reference
(/root/reference/train.py:11-54); evaluate.py / infer.py / test.py reuse it.
"""
