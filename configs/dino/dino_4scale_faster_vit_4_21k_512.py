# DINO-4scale + FasterViT-4-21K-512 (reference
# dino/config/DINO/DINO_4scale_faster_vit_4_21k_512.py).
_base_ = ["dino_4scale_faster_vit_4_21k_224.py"]

backbone = "faster_vit_4_21k_512"
epochs = 12
lr_drop = 11
