# Shared COCO augmentation base (reference
# dino/config/DINO/coco_transformer.py). Multi-scale training resizes to a
# random short side from data_aug_scales capped at data_aug_max_size.
data_aug_scales = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]
data_aug_max_size = 1333
data_aug_scales2_resize = [400, 500, 600]
data_aug_scales2_crop = [384, 600]
data_aug_scale_overlap = None
