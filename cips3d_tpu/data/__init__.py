from cips3d_tpu.data.zip_dataset import (  # noqa: F401
    DataLoader,
    ZipImageDataset,
    to_norm_tensor,
    write_stylegan_zip,
)
