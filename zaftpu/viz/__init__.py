from zaftpu.viz.display import (  # noqa: F401
    cqtchromshow,
    cqtspecshow,
    melspecshow,
    mfccshow,
    sigplot,
    specshow,
)
