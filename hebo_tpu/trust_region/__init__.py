from .casmo import CasmopolitanTrManager, ProxyTrManager
