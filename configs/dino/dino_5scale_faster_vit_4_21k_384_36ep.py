# DINO-5scale + FasterViT-4-21K-384 (reference
# dino/config/DINO/DINO_5scale_faster_vit_4_21k_384_36ep.py): the 4scale recipe with
# all four backbone strides (4/8/16/32) + the extra stride-64 level.
_base_ = ["dino_4scale_faster_vit_4_21k_384_36ep.py"]

num_feature_levels = 5
return_interm_indices = [0, 1, 2, 3]
use_checkpoint = False
