# Submodules are imported directly (captionax.models.decoder etc.); keep
# this __init__ lazy so partially built subsets of the package stay usable.
