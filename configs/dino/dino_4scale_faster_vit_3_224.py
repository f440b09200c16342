# DINO-4scale + FasterViT-3 (reference
# dino/config/DINO/DINO_4scale_faster_vit_3_224.py: the 21k-224 recipe
# with this backbone).
_base_ = ["dino_4scale_faster_vit_4_21k_224.py"]

backbone = "faster_vit_3_224"
