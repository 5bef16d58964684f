from mastermetastyletransfer_tpu.data.pipeline import (  # noqa: F401
    InfiniteIndexSampler, ImageFolderDataset, PrefetchLoader,
    device_preprocess_batch, list_images, make_train_iterators,
    repeat_style_to_batch,
)
