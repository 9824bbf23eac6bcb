"""Torch test oracles mirroring the reference architectures.

These are *test-only* reimplementations (torchvision is not installed in this
image) used to generate state_dicts + golden activations for converter /
forward parity tests. Structure follows torchvision resnet18 and habitat
ddppo resnet50 so the parameter names match the released checkpoints.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------- torchvision-style resnet18 pieces -------------
class BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _make_layer(inplanes, planes, stride):
    downsample = None
    if stride != 1 or inplanes != planes:
        downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes, 1, stride, bias=False),
            nn.BatchNorm2d(planes),
        )
    return nn.Sequential(
        BasicBlock(inplanes, planes, stride, downsample),
        BasicBlock(planes, planes),
    )


class ResNet18Children:
    """Provides the children list the reference slices (`unet_encoder.py:36-47`)."""

    def __init__(self, in_channels):
        self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = _make_layer(64, 64, 1)
        self.layer2 = _make_layer(64, 128, 2)
        self.layer3 = _make_layer(128, 256, 2)
        self.layer4 = _make_layer(256, 512, 2)

    def children(self):
        return [self.conv1, self.bn1, self.relu, self.maxpool,
                self.layer1, self.layer2, self.layer3, self.layer4]


def convrelu(in_c, out_c, k, p):
    return nn.Sequential(
        nn.Conv2d(in_c, out_c, k, padding=p),
        nn.BatchNorm2d(out_c),
        nn.ReLU(inplace=True),
    )


class TorchResNetUNet(nn.Module):
    """Mirror of reference `ResNetUNet` (`unet_encoder.py:30-111`)."""

    def __init__(self, n_in=3, n_out=27):
        super().__init__()
        base = ResNet18Children(n_in)
        layers = base.children()
        self.layer0 = nn.Sequential(*layers[:3])
        self.layer0_1x1 = convrelu(64, 64, 1, 0)
        self.layer1 = nn.Sequential(*layers[3:5])
        self.layer1_1x1 = convrelu(64, 64, 1, 0)
        self.layer2 = layers[5]
        self.layer2_1x1 = convrelu(128, 128, 1, 0)
        self.layer3 = layers[6]
        self.layer3_1x1 = convrelu(256, 256, 1, 0)
        self.layer4 = layers[7]
        self.layer4_1x1 = convrelu(512, 512, 1, 0)
        self.upsample = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
        self.conv_up3 = convrelu(256 + 512, 512, 3, 1)
        self.conv_up2 = convrelu(128 + 512, 256, 3, 1)
        self.conv_up1 = convrelu(64 + 256, 256, 3, 1)
        self.conv_up0 = convrelu(64 + 256, 128, 3, 1)
        self.conv_original_size0 = convrelu(n_in, 64, 3, 1)
        self.conv_original_size1 = convrelu(64, 64, 3, 1)
        self.conv_original_size2 = convrelu(64 + 128, 64, 3, 1)
        self.conv_last = nn.Conv2d(64, n_out, 1)

    def forward(self, x):
        x_original = self.conv_original_size1(self.conv_original_size0(x))
        layer0 = self.layer0(x)
        layer1 = self.layer1(layer0)
        layer2 = self.layer2(layer1)
        layer3 = self.layer3(layer2)
        layer4 = self.layer4_1x1(self.layer4(layer3))
        y = self.upsample(layer4)
        y = self.conv_up3(torch.cat([y, self.layer3_1x1(layer3)], 1))
        y = self.upsample(y)
        y = self.conv_up2(torch.cat([y, self.layer2_1x1(layer2)], 1))
        y = self.upsample(y)
        y = self.conv_up1(torch.cat([y, self.layer1_1x1(layer1)], 1))
        y = self.upsample(y)
        y = self.conv_up0(torch.cat([y, self.layer0_1x1(layer0)], 1))
        y = self.upsample(y)
        y = self.conv_original_size2(torch.cat([y, x_original], 1))
        return layer4, y, self.conv_last(y)


# --------------------------- ddppo GroupNorm resnet50 ----------------------
class GNBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, ngroups, stride=1, downsample=None):
        super().__init__()
        self.convs = nn.Sequential(
            nn.Conv2d(inplanes, planes, 1, bias=False),
            nn.GroupNorm(ngroups, planes),
            nn.ReLU(True),
            nn.Conv2d(planes, planes, 3, stride, 1, bias=False),
            nn.GroupNorm(ngroups, planes),
            nn.ReLU(True),
            nn.Conv2d(planes, planes * 4, 1, bias=False),
            nn.GroupNorm(ngroups, planes * 4),
        )
        self.downsample = downsample
        self.relu = nn.ReLU(True)

    def forward(self, x):
        out = self.convs(x)
        identity = x if self.downsample is None else self.downsample(x)
        return self.relu(out + identity)


class TorchDDPPOResNet(nn.Module):
    """Mirror of habitat ddppo `resnet50` (baseplanes 32, ngroups 16)."""

    def __init__(self, in_channels=1, base_planes=32, ngroups=16,
                 layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, base_planes, 7, 2, 3, bias=False)
        self.bn1 = nn.GroupNorm(ngroups, base_planes)
        self.relu = nn.ReLU(True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = base_planes
        self.layer1 = self._make_layer(base_planes, ngroups, layers[0], 1)
        self.layer2 = self._make_layer(base_planes * 2, ngroups, layers[1], 2)
        self.layer3 = self._make_layer(base_planes * 4, ngroups, layers[2], 2)
        self.layer4 = self._make_layer(base_planes * 8, ngroups, layers[3], 2)
        self.final_channels = self.inplanes

    def _make_layer(self, planes, ngroups, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.GroupNorm(ngroups, planes * 4),
            )
        layers = [GNBottleneck(self.inplanes, planes, ngroups, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(GNBottleneck(self.inplanes, planes, ngroups))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


class TorchResNetEncoder(nn.Module):
    """Mirror of habitat `ResNetEncoder` for depth (`resnet_encoders.py:25-32`)."""

    def __init__(self, spatial_size=128, in_channels=1):
        super().__init__()
        self.backbone = TorchDDPPOResNet(in_channels)
        final_spatial = int(spatial_size * (1 / 32))
        num_c = int(round(2048 / (final_spatial ** 2)))
        self.compression = nn.Sequential(
            nn.Conv2d(self.backbone.final_channels, num_c, 3, padding=1, bias=False),
            nn.GroupNorm(1, num_c),
            nn.ReLU(True),
        )
        self.output_shape = (num_c, final_spatial, final_spatial)

    def forward(self, depth_nhwc):
        x = depth_nhwc.permute(0, 3, 1, 2)
        x = F.avg_pool2d(x, 2)
        return self.compression(self.backbone(x))


# --------------------------- MGMapNet mirror (cached-features path) --------
class TorchMapEncoder(nn.Module):
    """Mirror of reference MapEncoder (`map_encoder.py:16-44`)."""

    def __init__(self, in_c=64, out_c=256):
        super().__init__()
        self.cnn = nn.Sequential(
            nn.Conv2d(in_c, 64, 8, stride=2, padding=3),
            nn.BatchNorm2d(64),
            nn.ReLU(True),
            nn.Conv2d(64, 128, 5, stride=2, padding=1),
            nn.BatchNorm2d(128),
            nn.ReLU(True),
            nn.Conv2d(128, out_c, 3, stride=1, padding=1),
            nn.BatchNorm2d(out_c),
            nn.ReLU(True),
        )

    def forward(self, x):
        return self.cnn(x)


class TorchMapDecoder(nn.Module):
    """Mirror of reference MapDecoder (`map_encoder.py:72-112`)."""

    def __init__(self, n_in=256):
        super().__init__()
        base = ResNet18Children(n_in)
        layers = base.children()
        self.layer0 = nn.Sequential(*layers[:3])
        self.layer0_1x1 = convrelu(64, 64, 1, 0)
        self.layer1 = nn.Sequential(*layers[3:5])
        self.layer1_1x1 = convrelu(64, 64, 1, 0)
        self.upsample = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
        self.conv_up0 = convrelu(64 + 64, 128, 3, 1)
        self.conv_original_size0 = convrelu(n_in, 64, 3, 1)
        self.conv_original_size1 = convrelu(64, 64, 3, 1)
        self.conv_original_size2 = convrelu(64 + 128, 64, 3, 1)

    def forward(self, x):
        x_original = self.conv_original_size1(self.conv_original_size0(x))
        layer0 = self.layer0(x)
        layer1 = self.layer1(layer0)
        y = self.upsample(self.layer1_1x1(layer1))
        y = self.conv_up0(torch.cat([y, self.layer0_1x1(layer0)], 1))
        y = self.upsample(y)
        return self.conv_original_size2(torch.cat([y, x_original], 1))


class TorchMGMapNetCached(nn.Module):
    """Mirror of MGMapNet (`mg_map_policy.py:19-251`) on cached features.

    Skips UNet/depth trunk (the bypasses at `unet_encoder.py:65`,
    `resnet_encoders.py:79`), mirrors everything downstream.
    """

    def __init__(self, vocab=100, emb=50, instr_h=128, hidden=512):
        super().__init__()
        self.embedding_layer = nn.Embedding(vocab, emb, padding_idx=0)
        self.encoder_rnn = nn.LSTM(emb, instr_h, bidirectional=True)
        self.spatial_embeddings = nn.Embedding(16, 64)
        self.rgb_linear = nn.Sequential(
            nn.AdaptiveAvgPool1d(1), nn.Flatten(), nn.Linear(512, 256), nn.ReLU(True))
        self.depth_linear = nn.Sequential(
            nn.Flatten(), nn.Linear(192 * 16, 128), nn.ReLU(True))
        self.map_encoder = TorchMapEncoder()
        self.map_decoder = TorchMapDecoder()
        self.map_classfier = nn.Sequential(
            nn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False),
            nn.BatchNorm2d(32), nn.ReLU(True),
            nn.Conv2d(32, 32, 3, 1, 1, bias=False),
            nn.BatchNorm2d(32), nn.ReLU(True),
            nn.Conv2d(32, 27, 1, 1, 0, bias=True),
        )
        self.map_encoded_linear = nn.Sequential(nn.Conv2d(256, 128, 3, 1, 1), nn.ReLU())
        self.map_classified_linear = nn.Sequential(nn.Conv2d(27, 128, 3, 1, 1), nn.ReLU())
        self.map_cated_linear = nn.Sequential(nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU())
        self.map_linear = nn.Sequential(
            nn.AdaptiveAvgPool1d(1), nn.Flatten(), nn.Linear(256, 256), nn.ReLU(True))
        self.state_rnn = nn.GRU(640, hidden)
        self.state_text_q_layer = nn.Linear(hidden, hidden // 2)
        self.state_text_k_layer = nn.Conv1d(2 * instr_h, hidden // 2, 1)
        self.text_map_q_layer = nn.Linear(2 * instr_h, hidden // 2)
        self.text_map_k_layer = nn.Conv1d(256, hidden // 2, 1)
        self.second_state_compress = nn.Sequential(
            nn.Linear(hidden + hidden // 2 + hidden // 2, hidden), nn.ReLU(True))
        self.second_rnn = nn.GRU(hidden, hidden)
        self._scale = 1.0 / ((hidden // 2) ** 0.5)

    def _attn(self, q, k, v, mask=None):
        logits = torch.einsum("nc, nci -> ni", q, k)
        if mask is not None:
            logits = logits - mask.float() * 1e8
        attn = F.softmax(logits * self._scale, dim=1)
        return torch.einsum("ni, nci -> nc", attn, v), attn

    def forward(self, instruction, rgb_features, depth_features, ego_map,
                hidden, masks):
        lengths = (instruction != 0).long().sum(dim=1)
        embedded = self.embedding_layer(instruction)
        packed = nn.utils.rnn.pack_padded_sequence(
            embedded, lengths, batch_first=True, enforce_sorted=False)
        out, _ = self.encoder_rnn(packed)
        instr = nn.utils.rnn.pad_packed_sequence(out, batch_first=True)[0]
        instr = instr.permute(0, 2, 1)  # [B, 256, T]
        text_mask = (instr == 0.0).all(dim=1)

        rgb_in = self.rgb_linear(torch.flatten(rgb_features, 2))

        b = depth_features.size(0)
        spatial = self.spatial_embeddings(
            torch.arange(0, 16, dtype=torch.long)
        ).view(1, -1, 4, 4).expand(b, 64, 4, 4)
        depth_emb = torch.cat([depth_features, spatial], dim=1)
        depth_in = self.depth_linear(torch.flatten(depth_emb, 2))

        map_encoded = self.map_encoder(ego_map)
        map_encoded_proj = self.map_encoded_linear(map_encoded)
        map_decoded = self.map_decoder(map_encoded)
        pred_sem_map = self.map_classfier(map_decoded)
        map_classified_proj = self.map_classified_linear(
            F.avg_pool2d(pred_sem_map, kernel_size=2, stride=2))
        map_embedding = self.map_cated_linear(
            torch.cat([map_encoded_proj, map_classified_proj], dim=1))
        map_embedding = torch.flatten(map_embedding, 2)  # [B, 256, S]
        map_in = self.map_linear(map_embedding)

        state_in = torch.cat([rgb_in, depth_in, map_in], dim=1)
        h1 = hidden[0:1] * masks.view(1, -1, 1)
        state, h1_new = self.state_rnn(state_in.unsqueeze(0), h1)
        state = state.squeeze(0)

        q = self.state_text_q_layer(state)
        k = self.state_text_k_layer(instr)
        text_embedding, _ = self._attn(q, k, instr, text_mask)

        q2 = self.text_map_q_layer(text_embedding)
        k2 = self.text_map_k_layer(map_embedding)
        map_att, att_map = self._attn(q2, k2, map_embedding, None)

        x = torch.cat([state, text_embedding, map_att], dim=1)
        x = self.second_state_compress(x)
        h2 = hidden[1:2] * masks.view(1, -1, 1)
        x, h2_new = self.second_rnn(x.unsqueeze(0), h2)
        return x.squeeze(0), torch.cat([h1_new, h2_new], 0), pred_sem_map, att_map
