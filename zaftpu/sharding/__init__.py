from zaftpu.sharding.mesh import (  # noqa: F401
    BATCH_AXIS,
    FRAME_AXIS,
    initialize_distributed,
    make_mesh,
    make_mesh_2d,
    shard_along,
)
from zaftpu.sharding.sharded import (  # noqa: F401
    cqtchromagram_sharded,
    cqtspectrogram_sharded,
    cqtspectrogram_tp,
    imdct_sharded,
    istft_sharded,
    mdct_sharded,
    melspectrogram_sharded,
    mfcc_sharded,
    spectrogram_sharded,
    stft_sharded,
)
